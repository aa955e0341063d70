"""A4 — the LLM region-analysis ACTOR stage (v10A.R:865-912, 1208-1262).

The reference's processor sends the numbered page-1 regions of each
document to a local LLM ("which rows are title / authors / abstract?"),
parses the JSON reply through the M26 ladder (v10A.R:914-1040), and slices
the abstract by the returned region ids, falling back to deterministic
defaults when the call or parse fails (v10A.R:1030-1035). It re-creates
the client per document (v10A.R:20-31) — the canonical A1/A4 warm-state
anti-pattern this engine exists to fix.

Ray-native shape: :class:`ExtractDocumentsLLM` is a callable CLASS for
``map_batches(..., concurrency=N)`` — the CLIENT is built ONCE per actor
in ``__init__`` (the A4 analog of a model handle / HTTP session), and
``__call__`` runs one prompt per document through
``doclogic.document.process_document``'s ``structure_provider`` hook.

No model server exists in this container, so ``client_factory`` defaults
to None → every document takes the deterministic fallback path, which is
byte-identical to the plain flagship stage (pinned by
tests/test_stages.py). Tests inject :class:`FakeLLMClient` — a
deterministic double that labels regions from the prompt itself — to
exercise the full prompt → parse → E6-slice path. A real client drops in
as ``client_factory=lambda: MyOllamaClient(url)`` with a ``complete(str)
-> str`` method; nothing else changes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..doclogic.classify import parse_llm_response
from .extract_stage import extract_batch


def page1_region_texts(rdf) -> list[str]:
    """Page-1 texts in (y, x) order — the region list the prompt numbers
    (v10A.R:869-880 builds the same enumeration)."""
    p1 = rdf["page"] == 1
    idx = np.nonzero(p1)[0]
    order = np.lexsort((rdf["x"][idx], rdf["y"][idx]))
    return [rdf["texts"][i] for i in idx[order]]


def build_region_prompt(texts: list[str]) -> str:
    """The region-analysis prompt: numbered 1-based rows + a JSON-shape
    instruction (v10A.R:881-912's structure request, content-faithful not
    byte-faithful — the reference prompt is model-tuned prose)."""
    lines = [f"{i + 1}: {t[:200]}" for i, t in enumerate(texts)]
    return (
        "Label the numbered page-1 regions of this document.\n"
        + "\n".join(lines)
        + '\nReply with JSON: {"title_regions": [..], "author_regions": [..],'
        ' "abstract_regions": [..], "introduction_regions": [..]}'
    )


_BATCH_SEP = "\n=== DOCUMENT {i} ===\n"


def build_batched_prompt(prompts: list[str]) -> str:
    """Pack N per-document region prompts into ONE request (TODO.md's
    batched-prompt perf step: real LLM serving amortizes per-request
    latency over many documents). The reply contract is a JSON ARRAY
    with one object per document, in order."""
    parts = [
        _BATCH_SEP.format(i=i + 1) + p.rsplit("\nReply with JSON:", 1)[0]
        for i, p in enumerate(prompts)
    ]
    return (
        "Label the numbered page-1 regions of EACH document below.\n"
        + "".join(parts)
        + '\nReply with a JSON ARRAY, one object per document in order, '
        'each shaped {"title_regions": [..], "author_regions": [..], '
        '"abstract_regions": [..], "introduction_regions": [..]}'
    )


class FakeLLMClient:
    """Deterministic test double: derives labels from the prompt text
    alone (no RNG, no network) so pipeline tests exercise the full
    prompt -> M26 parse -> E6 slice path with a stable expected output.

    Labeling rule: the first row whose text starts with 'Abstract' (case
    insensitive) is the abstract region; title=[2] authors=[3] mirror the
    fixture layout (header, title, authors, ...). Rows are 1-based ids
    into the numbered prompt, exactly what M26 expects."""

    def __init__(self):
        self.calls = 0

    @staticmethod
    def _one(prompt: str) -> str:
        abstract_rows = []
        for line in prompt.splitlines():
            head, sep, body = line.partition(": ")
            if sep and head.strip().isdigit() and body.lower().startswith("abstract"):
                abstract_rows.append(int(head))
        if not abstract_rows:
            abstract_rows = [3, 4, 5]
        return (
            '{"title_regions": [2], "author_regions": [3], '
            f'"abstract_regions": {abstract_rows}, "introduction_regions": null}}'
        )

    def complete(self, prompt: str) -> str:
        self.calls += 1
        if prompt.startswith("Label the numbered page-1 regions of EACH"):
            # batched protocol: answer per document section, as an array
            docs = prompt.split("=== DOCUMENT ")[1:]
            return "[" + ", ".join(self._one(d) for d in docs) + "]"
        return self._one(prompt)


class HttpLLMClient:
    """REAL HTTP client for an Ollama-compatible completion endpoint
    (``POST {url}/api/generate`` with ``{"model", "prompt", "stream":
    false}``; the reply's ``response`` field is the completion — the wire
    format the reference's R code speaks to its local llama3.1,
    v10A.R:753-819). stdlib urllib only — no client dependency.

    Built ONCE per actor (an HTTP client is exactly the warm state the
    A4 pool exists for); ``complete`` retries ``retries`` times and
    raises on final failure — the stage's ``_structure`` catch then
    degrades that document to the deterministic fallback, mirroring the
    reference's tryCatch (v10A.R:1030-1035). Exercised in tests against
    a loopback fake server speaking the same wire format."""

    def __init__(
        self,
        url: str = "http://127.0.0.1:11434",
        model: str = "llama3.1",
        timeout: float = 30.0,
        retries: int = 1,
    ):
        self.url = url.rstrip("/") + "/api/generate"
        self.model = model
        self.timeout = timeout
        self.retries = retries
        self.calls = 0

    def complete(self, prompt: str) -> str:
        import json
        import time
        import urllib.request

        body = json.dumps(
            {"model": self.model, "prompt": prompt, "stream": False}
        ).encode("utf-8")
        last: Exception | None = None
        for attempt in range(self.retries + 1):
            try:
                req = urllib.request.Request(
                    self.url, data=body, headers={"Content-Type": "application/json"}
                )
                with urllib.request.urlopen(req, timeout=self.timeout) as r:
                    self.calls += 1
                    return json.loads(r.read().decode("utf-8"))["response"]
            except Exception as e:  # noqa: BLE001 — retried, then surfaced
                last = e
                if attempt < self.retries:
                    time.sleep(0.1 * (attempt + 1))
        raise last


class ExtractDocumentsLLM:
    """Flagship extraction WITH the per-document A4 region-analysis call.

    ``ds.map_batches(ExtractDocumentsLLM, fn_constructor_kwargs={
    "client_factory": FakeLLMClient}, batch_format="pyarrow",
    concurrency=(1, N))`` — actor pool because the client is real state
    (HTTP session / loaded weights), unlike the stateless regex default
    (CLAUDE.md actor-pool note)."""

    def __init__(
        self,
        cleaning_method: str = "hybrid",
        client_factory=None,
        batch_prompts: int = 1,
    ):
        # warm per-actor state: compiled regex tables + the LLM client
        from ..doclogic import cleaners, extract, formats  # noqa: F401

        self.cleaning_method = cleaning_method
        self.client = client_factory() if client_factory is not None else None
        # batch_prompts > 1 packs that many documents per LLM request
        # (one JSON-array reply) — the per-request latency amortization of
        # real serving; output is IDENTICAL to per-doc calls (pinned in
        # tests), and any batched parse failure degrades that chunk to the
        # deterministic fallback, same as a failed single call.
        self.batch_prompts = max(1, int(batch_prompts))

    def _structure(self, rdf):
        if self.client is None:
            return None  # deterministic fallback path (v10A.R:1030-1035)
        try:
            reply = self.client.complete(build_region_prompt(page1_region_texts(rdf)))
        except Exception:
            return None  # client failure -> deterministic fallback, never a crash
        return parse_llm_response(reply)

    def _batched_structures(self, batch: pa.Table) -> dict:
        """Pre-pass: one region prompt per document (geometry recomputed
        once — noise against real LLM latency), packed ``batch_prompts``
        per request, parsed through the SAME M26 ladder. Returns
        {prompt: structure|None}; keying by prompt content is
        identity-safe (identical docs share a prompt AND a structure)."""
        import json

        from ..doclogic.document import _build_rdf, order_document
        from .extract_stage import iter_span_lists

        prompts = []
        for _doc_id, kinds, texts, refs, offs in iter_span_lists(batch):
            try:
                idx, geom = order_document(kinds, texts, refs, offs)
                rdf = _build_rdf(kinds, texts, refs, geom, idx)
                prompts.append(build_region_prompt(page1_region_texts(rdf)))
            except Exception:
                continue  # the doc will quarantine in the main pass anyway
        unique = list(dict.fromkeys(prompts))
        out: dict = {}
        for i in range(0, len(unique), self.batch_prompts):
            chunk = unique[i : i + self.batch_prompts]
            structures = [None] * len(chunk)
            try:
                reply = self.client.complete(build_batched_prompt(chunk))
                arr = json.loads(reply)
                if isinstance(arr, list) and len(arr) == len(chunk):
                    structures = [
                        parse_llm_response(json.dumps(obj)) for obj in arr
                    ]
            except Exception:
                pass  # whole chunk -> deterministic fallback
            out.update(zip(chunk, structures))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.client is None or self.batch_prompts <= 1:
            return extract_batch(
                batch, self.cleaning_method, structure_provider=self._structure
            )
        lookup = self._batched_structures(batch)

        def provider(rdf):
            return lookup.get(build_region_prompt(page1_region_texts(rdf)))

        return extract_batch(batch, self.cleaning_method, structure_provider=provider)
