"""Cross-job incremental dedup index — the engine's one SHARED MUTABLE
INDEX, and therefore its one deliberate drop to raw Ray actors (SURVEY.md
§7's "only where the Dataset API genuinely can't express the semantics"):
a Dataset pipeline is a pure dataflow and cannot hold state that outlives
it, but incremental crawl dedup needs exactly that — shard N+1 of a corpus
must be deduped against every text already admitted by shards 1..N, which
may have run hours earlier in different jobs.

Shape:
- ``_IndexShard`` (``num_cpus=0`` — bookkeeping, not compute) holds a
  ``text_md5 -> first doc_id`` dict for its hash range.
- ``DedupIndex`` fans a batch's hashes out to shards by hash prefix and
  merges the keep masks; memory scales horizontally with ``num_shards``
  (at 100 TB: one shard per node, ~16 bytes x distinct-texts / shards).
- ``incremental_dedup`` is the per-job pipeline: WITHIN-job exact dedup
  first (bucketed merge, min-doc_id keeper — so each distinct hash hits
  the index exactly once per job, which is what makes the admit decision
  deterministic regardless of batch arrival order), then a streaming
  filter through the index.

Determinism contract: jobs are sequential (that is the *meaning* of
incremental — a job's output is committed before the next crawl shard
arrives; callers must consume/materialize one job's survivors before
submitting the next). Within a job, arrival order does not matter because
the pre-dedup leaves one candidate per hash. Under that contract the
survivor set equals global keep-first dedup ordered by (job sequence,
doc_id) — which is what the driver oracle checks with a plain
``row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id)`` when jobs
partition doc_id into increasing ranges.

``snapshot()``/``restore()`` round-trip the index through plain Arrow
tables so a long-lived crawl can persist it next to the output manifests
(state/checkpoint.py) and resume after a cluster restart.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from ..functions import text as T


@ray.remote(num_cpus=0)
class _IndexShard:
    """One hash range of the index: dict of text_md5 -> first doc_id."""

    def __init__(self):
        self._first: dict = {}

    def check_and_add(self, hashes: list, doc_ids: list) -> np.ndarray:
        """Admit hashes not yet indexed (registering their doc_id);
        return the keep mask. First caller wins — callers guarantee one
        candidate per hash per job (see module docstring)."""
        first = self._first
        out = np.empty(len(hashes), dtype=bool)
        for i, (h, d) in enumerate(zip(hashes, doc_ids)):
            if h in first:
                out[i] = False
            else:
                first[h] = d
                out[i] = True
        return out

    def size(self) -> int:
        return len(self._first)

    def snapshot(self) -> pa.Table:
        return pa.table(
            {
                "text_md5": list(self._first.keys()),
                "doc_id": list(self._first.values()),
            }
        )

    def restore(self, table: pa.Table) -> int:
        self._first.update(
            zip(
                table.column("text_md5").to_pylist(),
                table.column("doc_id").to_pylist(),
            )
        )
        return len(self._first)


class DedupIndex:
    """Sharded text-hash index. Route by the first 8 hex digits of the
    md5 (uniform), call shards in parallel, reassemble the mask."""

    def __init__(self, num_shards: int = 8):
        self.num_shards = num_shards
        self.shards = [_IndexShard.remote() for _ in range(num_shards)]

    def _route(self, hashes: list) -> np.ndarray:
        return np.array(
            [int(h[:8], 16) % self.num_shards for h in hashes], dtype=np.int64
        )

    def check_and_add(self, hashes: list, doc_ids) -> np.ndarray:
        if len(hashes) == 0:
            return np.zeros(0, dtype=bool)
        doc_ids = list(doc_ids)
        owner = self._route(hashes)
        keep = np.empty(len(hashes), dtype=bool)
        refs, slots = [], []
        for s in range(self.num_shards):
            idx = np.nonzero(owner == s)[0]
            if len(idx):
                refs.append(
                    self.shards[s].check_and_add.remote(
                        [hashes[i] for i in idx], [doc_ids[i] for i in idx]
                    )
                )
                slots.append(idx)
        for idx, mask in zip(slots, ray.get(refs)):
            keep[idx] = mask
        return keep

    def size(self) -> int:
        return int(sum(ray.get([s.size.remote() for s in self.shards])))

    def snapshot(self) -> pa.Table:
        tables = ray.get([s.snapshot.remote() for s in self.shards])
        return pa.concat_tables(tables)

    def restore(self, table: pa.Table) -> None:
        """Reload a snapshot (re-routing — num_shards may differ)."""
        hashes = table.column("text_md5").to_pylist()
        owner = self._route(hashes)
        doc_ids = table.column("doc_id").to_pylist()
        refs = []
        for s in range(self.num_shards):
            idx = np.nonzero(owner == s)[0]
            if len(idx):
                sub = pa.table(
                    {
                        "text_md5": [hashes[i] for i in idx],
                        "doc_id": [doc_ids[i] for i in idx],
                    }
                )
                refs.append(self.shards[s].restore.remote(sub))
        ray.get(refs)


def incremental_dedup(
    index: DedupIndex,
    docs: "ray.data.Dataset",
    keep_columns: tuple = ("doc_id", "lang", "n_chars"),
) -> "ray.data.Dataset":
    """Dedup one job's documents against (and into) a cross-job index.

    Stage 1 — within-job exact dedup carrying the output row: hash per
    batch, keep min-doc_id row per hash inside the batch (combiner), then
    a bucketed merge so each distinct hash survives exactly once with its
    smallest doc_id. The shuffle moves one row per distinct hash per
    batch (the stages/dedup.py pre-aggregate shape), carrying only
    ``keep_columns`` — never the text.

    Stage 2 — streaming index filter: each batch routes its (now unique)
    hashes to the index shards; admitted rows pass through.
    """
    from ..relational import bucketed_group_merge

    cols = list(keep_columns)

    def hash_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df[cols].copy()
        out["text_md5"] = [T.md5_fingerprint(t) for t in df["text"].tolist()]
        # combiner: one candidate (min doc_id) per hash per batch
        return out.sort_values("doc_id", kind="stable").drop_duplicates(
            "text_md5", keep="first"
        )

    candidates = bucketed_group_merge(
        docs.map_batches(hash_partial, batch_format="pandas"),
        ["text_md5"],
        lambda df: df.sort_values("doc_id", kind="stable").drop_duplicates(
            "text_md5", keep="first"
        ),
    )

    def index_filter(df: pd.DataFrame) -> pd.DataFrame:
        keep = index.check_and_add(
            df["text_md5"].tolist(), df["doc_id"].tolist()
        )
        return df.loc[keep, cols]

    return candidates.map_batches(index_filter, batch_format="pandas")
