"""Hand-built realistic page structures (VERDICT r3 #5): a news article
(header nav, breadcrumbs, byline, inline figure + caption, comments,
sidebar, footer), a product page (link-farm directory table vs an
in-content specs table, whats-in-the-box list) and a docs page (nested
TOC link list, pre code block, pager). Static fixtures - the synthesizer
in fixtures.py never produces these shapes, so block classification over
them is pinned literally in test_html_extraction.py."""

NEWS_ARTICLE = """<!DOCTYPE html>
<html lang="en">
<head><title>Storm Delays Harvest Across the Valley - The Daily Ledger</title>
<script src="/js/analytics.js"></script>
<style>.byline{color:#666}</style>
</head>
<body>
<header>
  <div class="logo"><a href="/">The Daily Ledger</a></div>
  <nav><a href="/news">News</a> <a href="/sport">Sport</a> <a href="/weather">Weather</a> <a href="/subscribe">Subscribe</a></nav>
</header>
<div class="breadcrumbs"><a href="/">Home</a> &gt; <a href="/news">News</a> &gt; <a href="/news/region">Region</a></div>
<main>
<article>
  <h1>Storm Delays Harvest Across the Valley</h1>
  <p class="byline">By Ana Petrova, Agriculture Correspondent</p>
  <p>Heavy rain over the weekend has pushed the start of the grain harvest back by
  at least ten days across the lower valley, farm cooperatives said on Monday,
  raising concerns about moisture damage to crops that were already late after a
  cool spring.</p>
  <figure>
    <img src="/img/2024/harvest-combines.jpg" alt="Combines idle in a wet field">
    <figcaption>Combines stood idle near Eastbrook on Sunday as fields drained.</figcaption>
  </figure>
  <p>The cooperative's regional office estimated that around forty percent of the
  winter wheat area is still standing, and said drying capacity would be the main
  bottleneck once cutting resumes. Elevators in three districts have extended
  their receiving hours in anticipation of a compressed delivery window.</p>
  <h2>Prices firm on the delay</h2>
  <p>Local cash prices firmed modestly on the news, with millers bidding up for
  early deliveries. Analysts cautioned that the move reflects timing rather than
  any change in the size of the crop itself, which remains close to the five-year
  average in most districts.</p>
</article>
<section class="comments">
  <h3>Comments</h3>
  <div class="comment"><p>Same story every year lately.</p></div>
  <div class="comment"><p>Good luck to the crews out there.</p></div>
</section>
</main>
<aside class="sidebar">
  <h4>Related</h4>
  <ul>
    <li><a href="/news/1">Rail strike threatens grain exports</a></li>
    <li><a href="/news/2">Fertilizer prices ease from spring peak</a></li>
    <li><a href="/news/3">Drought index falls after wet June</a></li>
  </ul>
</aside>
<footer>
  <p>&copy; 2024 The Daily Ledger. <a href="/terms">Terms</a> <a href="/privacy">Privacy</a></p>
</footer>
</body>
</html>"""

PRODUCT_PAGE = """<html>
<head><title>VX-220 Bench Power Supply - Specs</title></head>
<body>
<header><nav><a href="/">Home</a> <a href="/catalog">Catalog</a> <a href="/support">Support</a> <a href="/cart">Cart (0)</a></nav></header>
<div id="directory">
  <table class="linkfarm">
    <tr><td><a href="/c/psu">Power supplies</a></td><td><a href="/c/dmm">Multimeters</a></td><td><a href="/c/scope">Oscilloscopes</a></td></tr>
    <tr><td><a href="/c/gen">Generators</a></td><td><a href="/c/load">DC loads</a></td><td><a href="/c/acc">Accessories</a></td></tr>
  </table>
</div>
<main>
<h1>VX-220 Bench Power Supply</h1>
<p>The VX-220 is a linear bench supply aimed at repair work and small-signal
analog prototyping, where switching noise from cheaper units tends to show up
directly on the rails of the circuit under test. It pairs a conventional series
regulator with a relay-switched transformer tap to keep dissipation manageable
at low output voltages.</p>
<h2>Specifications</h2>
<table class="specs">
  <tr><th>Output voltage</th><td>0 to 30 V</td></tr>
  <tr><th>Output current</th><td>0 to 5 A</td></tr>
  <tr><th>Ripple</th><td>&lt; 1 mV rms</td></tr>
  <tr><th>Line regulation</th><td>0.01 % + 2 mV</td></tr>
</table>
<p>In bench testing the supply held its published ripple figure across the full
current range, and the tap-switching relay was audible only above four amps.
Thermal drift after a one-hour soak measured under two millivolts on the
ten-volt range, comfortably inside the datasheet envelope.</p>
<h2>What's in the box</h2>
<ul>
  <li>VX-220 unit with detachable IEC mains lead</li>
  <li>Pair of shrouded banana test leads, one metre</li>
  <li>Calibration certificate and printed quick-start guide</li>
</ul>
</main>
<footer><p><a href="/terms">Terms</a> | <a href="/returns">Returns</a> | <a href="/contact">Contact</a></p></footer>
</body>
</html>"""

DOCS_PAGE = """<html>
<head><title>Configuring retry policies</title></head>
<body>
<nav class="topbar"><a href="/docs">Docs</a> <a href="/api">API</a> <a href="/blog">Blog</a></nav>
<div class="toc">
  <ul>
    <li><a href="#overview">Overview</a></li>
    <li><a href="#backoff">Backoff strategies</a>
      <ul>
        <li><a href="#fixed">Fixed</a></li>
        <li><a href="#exp">Exponential</a></li>
      </ul>
    </li>
    <li><a href="#budgets">Retry budgets</a></li>
  </ul>
</div>
<article>
<h1>Configuring retry policies</h1>
<p>A retry policy decides when a failed call is attempted again and how long the
client waits between attempts. Retrying too eagerly turns a brief brownout into
a sustained overload, so the defaults here are deliberately conservative and
every knob is bounded by a budget described at the end of this page.</p>
<h2 id="backoff">Backoff strategies</h2>
<p>Two strategies are built in. Fixed backoff waits the same interval between
every attempt and suits queue consumers where latency is unimportant.
Exponential backoff doubles the wait after each failure up to a configurable
cap, and is the right default for interactive request paths.</p>
<pre>retry:
  strategy: exponential
  base_ms: 50
  cap_ms: 2000</pre>
<p>Whichever strategy you pick, add jitter in production. Synchronized retries
from a fleet of clients produce load spikes exactly when the dependency is
least able to absorb them, and full jitter removes that correlation at no cost
to median latency.</p>
<h2 id="budgets">Retry budgets</h2>
<p>A budget caps the fraction of traffic that retries may add, measured over a
sliding window. When the budget is exhausted further failures surface to the
caller immediately. The recommended configuration allows ten percent overhead,
which is generous for healthy systems and tight enough to matter during an
incident. The items below summarize the order in which limits are applied.</p>
<ul>
  <li>Per-attempt timeout, which bounds a single call</li>
  <li>Backoff with jitter, which spaces the attempts</li>
  <li>The retry budget, which bounds aggregate overhead</li>
</ul>
</article>
<div class="pager"><a href="/docs/timeouts">Previous: Timeouts</a> <a href="/docs/hedging">Next: Hedging</a></div>
<footer><p>Edit this page on <a href="https://example.com/repo">the repo</a>.</p></footer>
</body>
</html>"""
