"""Oracle-side input dump for the flagship-extraction CORRECTNESS gate.

The extraction pipeline's input is SYNTHESIZED (fixtures.spans_from_flat_text
over the flat ``documents`` testdata table), so DuckDB cannot see it through
the pre-registered views. This module writes that exact input — flattened to
one row per span — to a deterministic parquet path that the paired
``oracle_sql()`` strings read via ``read_parquet('<path>')``. The dump is the
INPUT (pre-extraction), never the expected output: the SQL recomputes reading
order / keep rules / scalars independently with window functions, so the
check stays a real two-implementation comparison.

``__ray_entry__.oracle_sql()`` calls :func:`dump_extract_input` for the
driver's sf0.01 before returning the SQL strings — the driver must obtain
the strings before it can execute them, so the dump always exists (and is
fresh) by oracle-execution time. Tests re-dump for their own sf_dir.

Pure Python + pyarrow — no Ray (callable before/without ray.init).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

DUMP_PATH = "/tmp/graft_oracle_io/extract_input.parquet"

_FLAT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)


def dump_extract_input(sf_dir: str, path: str = DUMP_PATH) -> str:
    """Write the flattened synthesized span input for ``sf_dir`` to ``path``.

    One row per span, doc_ids matching ``queries._spans_dataset`` at
    replicate=1 (``doc-{i:08d}-r0``). Deterministic: same sf_dir -> same
    file bytes (fixtures are seeded by doc_id only) — so a freshness
    sidecar (source path+mtime+size) lets repeated calls skip the
    re-synthesis (oracle_sql() is called once per oracle lookup).
    """
    import json

    from .fixtures import FLAT_SPANS_VERSION, spans_from_flat_text

    src = f"{sf_dir}/documents.parquet"
    st = os.stat(src)
    # the version salt invalidates dumps written by older synthesizer code
    # (same source bytes, different spans)
    stamp = {
        "src": src,
        "mtime": st.st_mtime,
        "size": st.st_size,
        "fixture_version": FLAT_SPANS_VERSION,
    }
    sidecar = path + ".src.json"
    try:
        with open(sidecar) as f:
            if json.load(f) == stamp and os.path.exists(path):
                return path  # fresh: same source bytes -> same dump
    except (OSError, ValueError):
        pass

    t = pq.read_table(src, columns=["doc_id", "text"])
    rows = {k: [] for k in ("doc_id", "kind", "text", "media_ref", "offset")}
    for i, txt in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist()):
        did = f"doc-{i:08d}-r0"
        for s in spans_from_flat_text(i, txt):
            rows["doc_id"].append(did)
            rows["kind"].append(s["kind"])
            rows["text"].append(s["text"])
            rows["media_ref"].append(s["media_ref"])
            rows["offset"].append(s["offset"])
    os.makedirs(os.path.dirname(path), exist_ok=True)
    # atomic publish: a concurrent reader (driver oracle vs test process)
    # must never see a half-written file — write tmp, then rename
    tmp = f"{path}.tmp.{os.getpid()}"
    pq.write_table(pa.table(rows, schema=_FLAT_SCHEMA), tmp)
    os.replace(tmp, path)
    with open(sidecar, "w") as f:
        json.dump(stamp, f)
    return path
