"""Pure per-document decision logic (no Ray imports).

This package is both the hot body of the extraction `map_batches` stage and
the single-doc oracle used to generate golden outputs (SURVEY.md §7.1 step
4): one implementation, exercised two ways. Everything here is
deterministic — no RNG, no time, no environment reads.
"""
