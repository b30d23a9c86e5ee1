"""Generate an sf1-scale testdata directory from the driver's sf0.1.

The shipped testdata stops at sf0.1 (~600k lineitem rows); the stated
target is 100 TB.  This tool manufactures the next factor locally —
10 FK-consistent replicas of sf0.1 (~6M lineitem rows, the TPC-H sf1
shape) — so the scale soak (tools/scale_soak.py) can measure per-query
sf1/sf0.1 wall ratios instead of asserting scalability untested.

Replication preserves value DISTRIBUTIONS (each replica is the driver
corpus with keys shifted past the previous replica's range) while
avoiding the replication artifacts that would corrupt the dedup /
similarity measurements:

- every key column shifts by ``replica * (max_key + 1)`` on BOTH
  sides of each FK (customer/orders, orders/lineitem,
  part+supplier/lineitem), so join fan-outs stay exactly the sf0.1
  fan-outs;
- ``documents.text`` is word-shuffled per (doc, replica>0) with a
  seeded RNG — same length/vocabulary (token stats, language-ID and
  quality distributions preserved) but destroyed shingle structure, so
  MinHash/SimHash/Jaccard near-dup rates stay corpus-like instead of
  exploding quadratically across 10 identical copies;
- ``embeddings.embedding`` is re-drawn per (vec, replica>0) from a
  vec_id-seeded Gaussian — replicated identical vectors would make
  every cross-replica pair an exact dup (sim 1.0) and quadratically
  swamp the near-dup queries;
- ``events`` shifts event_id AND user_id, so per-user session/funnel/
  retention cardinalities stay the sf0.1 ones, with 10x the users.

region/nation stay fixed (TPC-H semantics).  Deterministic end to end:
same input -> byte-identical tables, no wall-clock or global RNG.

Usage: python tools/make_scale_data.py [out_dir] [src_dir] [replicas]
       (defaults: /tmp/css_scale/sf1, /root/testdata/sf0.1, 10)
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# key columns to shift, per table: {column: base_table_for_range}
SHIFTS: dict[str, dict[str, tuple[str, str]]] = {
    "customer": {"c_custkey": ("customer", "c_custkey")},
    "supplier": {"s_suppkey": ("supplier", "s_suppkey")},
    "part": {"p_partkey": ("part", "p_partkey")},
    "orders": {
        "o_orderkey": ("orders", "o_orderkey"),
        "o_custkey": ("customer", "c_custkey"),
    },
    "lineitem": {
        "l_orderkey": ("orders", "o_orderkey"),
        "l_partkey": ("part", "p_partkey"),
        "l_suppkey": ("supplier", "s_suppkey"),
    },
    "events": {
        "event_id": ("events", "event_id"),
        "user_id": ("events", "user_id"),
    },
}


def _replicate_sql(con, src: str, out: str, table: str, replicas: int) -> None:
    path = os.path.join(src, f"{table}.parquet")
    strides = {}
    for col, (base_t, base_c) in SHIFTS[table].items():
        base_path = os.path.join(src, f"{base_t}.parquet")
        (mx,) = con.execute(
            f"SELECT max({base_c}) FROM read_parquet('{base_path}')"
        ).fetchone()
        strides[col] = int(mx) + 1
    cols = [
        d[0]
        for d in con.execute(f"DESCRIBE SELECT * FROM read_parquet('{path}')").fetchall()
    ]
    sel = ", ".join(
        f"({c} + r.i * {strides[c]}) AS {c}" if c in strides else c for c in cols
    )
    con.execute(
        f"""
        COPY (
          SELECT {sel}
          FROM read_parquet('{path}'),
               (SELECT unnest(generate_series(0, {replicas - 1})) AS i) r
          ORDER BY r.i
        ) TO '{os.path.join(out, f"{table}.parquet")}'
          (FORMAT parquet, ROW_GROUP_SIZE 65536)
        """
    )


ZIPF_VOCAB = 30_000
ZIPF_EXPONENT = 1.05
ZIPF_NEAR_DUP_EVERY = 50  # every 50th doc ~90%-overlaps its predecessor


def _zipf_words() -> tuple[np.ndarray, np.ndarray]:
    """Rank-indexed synthetic vocabulary + Zipf pmf (computed once)."""
    ranks = np.arange(1, ZIPF_VOCAB + 1, dtype=np.float64)
    p = 1.0 / ranks**ZIPF_EXPONENT
    p /= p.sum()
    words = np.array([f"w{r}" for r in range(1, ZIPF_VOCAB + 1)], dtype=object)
    return words, p


def _replicate_documents(
    src: str, out: str, replicas: int, text_mode: str = "shuffle"
) -> None:
    t = pq.read_table(os.path.join(src, "documents.parquet"))
    n = t.num_rows
    doc_ids = t.column("doc_id").to_pylist()
    texts = t.column("text").to_pylist()
    langs = t.column("lang").to_pylist()
    sources = t.column("source").to_pylist()
    stride = max(doc_ids) + 1
    out_ids, out_txt, out_lang, out_src, out_n = [], [], [], [], []
    zwords, zp = _zipf_words() if text_mode == "zipf" else (None, None)
    prev_words: list[str] | None = None
    for i in range(replicas):
        for j in range(n):
            did = doc_ids[j] + i * stride
            if text_mode == "zipf":
                # round-12: Zipfian text mode.  The driver corpus is a
                # 40-word vocabulary — every shingle/prefix-gram is
                # common, the adversarial regime for inverted-index
                # operators.  Real text is Zipfian: most grams are
                # rare and posting lists collapse.  Regenerate each
                # doc from a 30k-word Zipf(1.05) vocabulary (seeded by
                # doc id; same word COUNT as the source doc), with
                # every 50th doc a ~90%-overlap edit of its
                # predecessor so near-dup joins keep real positives.
                n_words = len(texts[j].split(" "))
                rng = np.random.default_rng(did)
                if prev_words is not None and did % ZIPF_NEAR_DUP_EVERY == 0:
                    words = list(prev_words[:n_words])
                    n_edit = max(1, len(words) // 10)
                    pos = rng.choice(len(words), size=n_edit, replace=False)
                    repl = zwords[rng.choice(ZIPF_VOCAB, size=n_edit, p=zp)]
                    for k, w in zip(pos, repl):
                        words[k] = w
                else:
                    words = list(zwords[rng.choice(ZIPF_VOCAB, size=n_words, p=zp)])
                prev_words = words
                txt = " ".join(words)
            elif i == 0:
                txt = texts[j]
            else:
                words = texts[j].split(" ")
                rng = np.random.default_rng(did)
                txt = " ".join(np.array(words, dtype=object)[rng.permutation(len(words))])
            out_ids.append(did)
            out_txt.append(txt)
            out_lang.append(langs[j])
            out_src.append(sources[j])
            out_n.append(len(txt))
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "text": pa.array(out_txt, pa.string()),
                "lang": pa.array(out_lang, pa.string()),
                "source": pa.array(out_src, pa.string()),
                "n_chars": pa.array(out_n, pa.int64()),
            }
        ),
        os.path.join(out, "documents.parquet"),
        # many row groups so the scan SPLITS: a single-row-group file
        # is unsplittable no matter what maxPartitionBytes says (found
        # by the round-6 soak — document scans ran one task at sf10)
        row_group_size=4096,
    )


def _replicate_embeddings(src: str, out: str, replicas: int) -> None:
    t = pq.read_table(os.path.join(src, "embeddings.parquet"))
    vec_ids = t.column("vec_id").to_pylist()
    vecs = t.column("embedding").to_pylist()
    labels = t.column("label").to_pylist()
    dim = len(vecs[0])
    stride = max(vec_ids) + 1
    out_ids, out_vecs, out_lab = [], [], []
    for i in range(replicas):
        for j, vid in enumerate(vec_ids):
            nid = vid + i * stride
            out_ids.append(nid)
            if i == 0:
                out_vecs.append(vecs[j])
            else:
                rng = np.random.default_rng(nid)
                out_vecs.append(rng.standard_normal(dim).astype(np.float32).tolist())
            out_lab.append(labels[j])
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(out_ids, pa.int64()),
                "embedding": pa.array(out_vecs, pa.list_(pa.float32())),
                "label": pa.array(out_lab, pa.int32()),
            }
        ),
        os.path.join(out, "embeddings.parquet"),
        row_group_size=4096,
    )


def make_scale_data(
    out: str = "/tmp/css_scale/sf1",
    src: str = "/root/testdata/sf0.1",
    replicas: int = 10,
    text_mode: str = "shuffle",
) -> str:
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    for table in ("region", "nation"):
        shutil.copy(os.path.join(src, f"{table}.parquet"), out)
    for table in SHIFTS:
        _replicate_sql(con, src, out, table, replicas)
    _replicate_documents(src, out, replicas, text_mode)
    _replicate_embeddings(src, out, replicas)
    with open(os.path.join(out, "_DONE"), "w") as fh:
        fh.write(f"src={src} replicas={replicas} text_mode={text_mode}\n")
    return out


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/css_scale/sf1"
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    replicas = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    text_mode = sys.argv[4] if len(sys.argv) > 4 else "shuffle"
    print(make_scale_data(out, src, replicas, text_mode))
