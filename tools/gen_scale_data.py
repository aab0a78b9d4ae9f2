"""Generate synthetic scale-rehearsal data beyond the driver-provided SFs.

The driver ships read-only testdata at sf{0.001,0.01,0.1} (TESTDATA.md);
measuring scaling EXPONENTS needs a decade above the bench SF. This
generator reproduces the driver tables' observed shapes (same schemas,
same column domains, same tokens-per-doc / items-per-order
distributions, seeded duplicate structure) so operators see
statistically equivalent inputs at any SF — it does NOT byte-reproduce
the driver data (different RNG), so gate oracles are not run on it;
it exists for BENCH_SCALE.md timing curves only.

Scope: the full star schema — documents, lineitem, embeddings, orders,
customer, supplier, part, nation, region, events — so ANY registry
gate runs at a rehearsal SF.

Row groups are explicitly bounded (8192 rows for documents/embeddings):
pyarrow's default writes small tables as ONE row group, and a
single-row-group parquet file is UNSPLITTABLE — Spark scans it with one
task, serializing the scan stage no matter how many cores exist. At
sf10 that artifact alone made the MinHash signature stage look
super-linear (one task exploding 27M shingles). The same rule applies
to real 100 TB ingestion: writer row-group size bounds scan
parallelism.

    python tools/gen_scale_data.py 1 /tmp/scale/sf1
    python tools/gen_scale_data.py 1 /tmp/scale/sf1-skew --skew

``--skew`` (r9 judge ask #1 — adversarial-distribution rehearsal)
keeps every schema and row count identical but replaces the benign
distributions with the shapes real corpora have:

- documents: one BOILERPLATE near-dup cluster covering 6% of the
  corpus (same template, 2-token jitter — the hot-LSH-bucket case
  minhash's ``max_bucket_size`` guard exists for), a 90%-one-language
  mix (stresses alpha/UniMax reweighting), and a ZIPF(1.3) host in
  ``source`` over 1000 hosts (hot-reducer URL/host groupings);
- lineitem: one hot l_orderkey carrying ~2% of ALL line rows (the
  AQE-skew-join / salting case);
- events: one hot user_id carrying ~50% of events (sessionization /
  stateful-stream state skew);
- embeddings: 20% of vectors collapse into one tight ball (k-means
  blocking / IVF list skew).

The skew mutations draw from a SEPARATE rng stream so the uniform
output stays byte-identical to pre-skew rounds.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

# the driver corpus vocabulary (observed: 30 uniform tokens + a rare
# 'dup' marker riding on duplicated docs)
VOCAB = np.array(
    "spark window merge table column vector stream value data small "
    "join filter big group hash customer sort order slow line part "
    "fast the row agg key query a scan batch".split()
)
LANGS = np.array(["en", "zh", "fr", "de", "es"])
LANG_P = np.array([0.41, 0.1475, 0.1475, 0.1475, 0.1475])


def gen_documents(out_dir: str, sf: float, seed: int = 42, skew: bool = False) -> int:
    n = max(500, int(round(50000 * sf)))
    rng = np.random.default_rng(seed)
    lengths = rng.integers(10, 101, n)
    toks = rng.integers(0, len(VOCAB), int(lengths.sum()))
    offs = np.concatenate([[0], np.cumsum(lengths)])
    texts = [" ".join(VOCAB[toks[offs[i] : offs[i + 1]]]) for i in range(n)]
    # seeded duplicate structure (feeds dedup/cluster gates at every SF):
    # ~0.2% exact copies of an earlier doc, ~0.5% near-dups (3 tokens
    # swapped for the 'dup' marker) — proportional, so candidate-pair
    # counts scale linearly with the corpus like the driver data's do
    for i in rng.choice(np.arange(50, n), max(1, n // 500), replace=False):
        texts[i] = texts[int(rng.integers(0, i))]
    for i in rng.choice(np.arange(50, n), max(2, n // 200), replace=False):
        words = texts[int(rng.integers(0, i))].split()
        for j in rng.integers(0, len(words), 3):
            words[int(j)] = "dup"
        texts[i] = " ".join(words)
    lang = rng.choice(LANGS, n, p=LANG_P)
    source = np.array([f"src{int(s)}" for s in rng.integers(0, 20, n)])
    if skew:
        rs = np.random.default_rng(seed + 1000)
        # boilerplate near-dup cluster: 6% of the corpus is one template
        # with 2-token jitter — every member lands in the same LSH
        # buckets, the B²/2 candidate blowup max_bucket_size exists for
        template = " ".join(VOCAB[rs.integers(0, len(VOCAB), 60)])
        cluster = rs.choice(np.arange(50, n), max(5, int(0.06 * n)), replace=False)
        for i in cluster:
            words = template.split()
            for j in rs.integers(0, len(words), 2):
                words[int(j)] = str(VOCAB[int(rs.integers(0, len(VOCAB)))])
            texts[i] = " ".join(words)
        # 90%-one-language mix
        dom = rs.random(n) < 0.9
        lang = np.where(dom, "en", rs.choice(LANGS[1:], n))
        # Zipf(1.3) hosts over 1000 — the hot-host case for URL/host
        # keyed aggregations and link graphs
        hosts = np.minimum(rs.zipf(1.3, n), 1000) - 1
        source = np.array([f"src{int(h)}" for h in hosts])
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(lang, pa.string()),
            "source": pa.array(source, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"), row_group_size=8192)
    return n


def gen_lineitem(out_dir: str, sf: float, seed: int = 43, skew: bool = False) -> int:
    n_orders = int(round(150000 * sf * 10))  # 150k orders at sf0.1
    rng = np.random.default_rng(seed)
    sizes = rng.poisson(3.0, n_orders) + 1  # observed mean 4, tail to ~17
    if skew:
        # one HOT order key carrying ~2% of all line rows: the join on
        # l_orderkey gets one reducer with 2% of the table (AQE skew
        # split / salting territory)
        sizes[0] += max(1, int(0.02 * sizes.sum()))
    n = int(sizes.sum())
    orderkey = np.repeat(np.arange(n_orders, dtype=np.int64), sizes)
    linenumber = (
        np.arange(n, dtype=np.int64)
        - np.repeat(np.concatenate([[0], np.cumsum(sizes)[:-1]]), sizes)
        + 1
    )
    n_supp = max(10, int(round(10000 * sf)))
    n_part = max(200, int(round(200000 * sf)))
    ship = np.datetime64("1995-01-01") + rng.integers(
        0, 2500, n
    ).astype("timedelta64[D]")
    tbl = pa.table(
        {
            "l_orderkey": pa.array(orderkey, pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n), pa.int64()),
            "l_linenumber": pa.array(linenumber.astype(np.int32), pa.int32()),
            "l_quantity": pa.array(rng.integers(1, 51, n).astype(float)),
            "l_extendedprice": pa.array(
                np.round(rng.uniform(900.0, 105000.0, n), 2)
            ),
            "l_discount": pa.array(rng.integers(0, 11, n) / 100.0),
            "l_tax": pa.array(rng.integers(0, 9, n) / 100.0),
            "l_returnflag": pa.array(rng.choice(["A", "N", "R"], n), pa.string()),
            "l_linestatus": pa.array(rng.choice(["O", "F"], n), pa.string()),
            "l_shipdate": pa.array(ship.astype("datetime64[us]")),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "lineitem.parquet"))
    return n


def gen_embeddings(
    out_dir: str, sf: float, seed: int = 44, dim: int = 64, skew: bool = False
) -> int:
    # observed driver shape: 2000 vecs at sf0.1, 500 floor; 10 labels;
    # clusterable structure (label-dependent mean) so k-means blocking
    # (semdedup/IVF) sees real cells, plus unit-scale noise like the
    # driver vectors
    n = max(500, int(round(20000 * sf)))
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 10, n)
    centers = rng.standard_normal((10, dim)) * 0.5
    vecs = (centers[labels] + rng.standard_normal((n, dim)) * 0.3).astype(
        np.float32
    )
    if skew:
        # 20% of vectors collapse into ONE tight ball: k-means blocking
        # (semdedup) and IVF assignment get one dominant cell
        rs = np.random.default_rng(seed + 1000)
        hot = rs.random(n) < 0.2
        labels = np.where(hot, 0, labels)
        vecs[hot] = (centers[0] + rs.standard_normal((int(hot.sum()), dim)) * 0.05).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(
                [v.tolist() for v in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype(np.int32), pa.int32()),
        }
    )
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"), row_group_size=8192)
    return n


def gen_dimensions(
    out_dir: str, sf: float, seed: int = 45, skew: bool = False
) -> dict[str, int]:
    """The rest of the star schema (driver-observed shapes) so ANY
    registry gate can run at a rehearsal SF: orders/customer/supplier/
    part keyed consistently with gen_lineitem's FK domains, fixed
    nation/region, and the events stream table."""
    rng = np.random.default_rng(seed)
    counts: dict[str, int] = {}

    n_orders = int(round(1500000 * sf))
    od = np.datetime64("1995-01-01") + rng.integers(0, 2400, n_orders).astype(
        "timedelta64[D]"
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n_orders), pa.int64()),
                "o_custkey": pa.array(
                    rng.integers(0, max(150, int(round(150000 * sf))), n_orders),
                    pa.int64(),
                ),
                "o_orderstatus": pa.array(rng.choice(["O", "F", "P"], n_orders)),
                "o_totalprice": pa.array(
                    np.round(rng.uniform(1000.0, 500000.0, n_orders), 2)
                ),
                "o_orderdate": pa.array(od.astype("datetime64[us]")),
                "o_orderpriority": pa.array(
                    rng.choice(
                        ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"],
                        n_orders,
                    )
                ),
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
    )
    counts["orders"] = n_orders

    n_cust = max(150, int(round(150000 * sf)))
    pq.write_table(
        pa.table(
            {
                "c_custkey": pa.array(np.arange(n_cust), pa.int64()),
                "c_name": pa.array([f"Customer_{i}" for i in range(n_cust)]),
                "c_nationkey": pa.array(
                    rng.integers(0, 25, n_cust).astype(np.int32), pa.int32()
                ),
                "c_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_cust), 2)),
                "c_mktsegment": pa.array(
                    rng.choice(
                        ["AUTOMOBILE", "BUILDING", "FURNITURE", "MACHINERY", "HOUSEHOLD"],
                        n_cust,
                    )
                ),
            }
        ),
        os.path.join(out_dir, "customer.parquet"),
    )
    counts["customer"] = n_cust

    n_supp = max(10, int(round(10000 * sf)))
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array(np.arange(n_supp), pa.int64()),
                "s_name": pa.array([f"Supplier_{i}" for i in range(n_supp)]),
                "s_nationkey": pa.array(
                    rng.integers(0, 25, n_supp).astype(np.int32), pa.int32()
                ),
                "s_acctbal": pa.array(np.round(rng.uniform(-1000, 10000, n_supp), 2)),
            }
        ),
        os.path.join(out_dir, "supplier.parquet"),
    )
    counts["supplier"] = n_supp

    n_part = max(200, int(round(200000 * sf)))
    pq.write_table(
        pa.table(
            {
                "p_partkey": pa.array(np.arange(n_part), pa.int64()),
                "p_name": pa.array([f"part_{i}" for i in range(n_part)]),
                "p_brand": pa.array(
                    [f"Brand#{int(b)}" for b in rng.integers(0, 25, n_part)]
                ),
                "p_type": pa.array(
                    rng.choice(["SMALL", "MEDIUM", "LARGE", "ECONOMY", "STANDARD"], n_part)
                ),
                "p_size": pa.array(
                    rng.integers(1, 51, n_part).astype(np.int32), pa.int32()
                ),
                "p_retailprice": pa.array(np.round(rng.uniform(900, 1000, n_part), 2)),
            }
        ),
        os.path.join(out_dir, "part.parquet"),
    )
    counts["part"] = n_part

    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array(np.arange(25, dtype=np.int32), pa.int32()),
                "n_name": pa.array([f"NATION_{i}" for i in range(25)]),
                "n_regionkey": pa.array(
                    (np.arange(25) % 5).astype(np.int32), pa.int32()
                ),
            }
        ),
        os.path.join(out_dir, "nation.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array(np.arange(5, dtype=np.int32), pa.int32()),
                "r_name": pa.array(
                    ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
                ),
            }
        ),
        os.path.join(out_dir, "region.parquet"),
    )
    counts["nation"], counts["region"] = 25, 5

    n_ev = int(round(1000000 * sf))
    ts = np.datetime64("2024-01-01") + np.sort(
        rng.integers(0, 30 * 86400 * 10**6, n_ev)
    ).astype("timedelta64[us]")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n_ev), pa.int64()),
                "ts": pa.array(ts),
                "user_id": pa.array(
                    (
                        np.where(
                            np.random.default_rng(seed + 1000).random(n_ev) < 0.5,
                            0,
                            rng.integers(0, max(15, int(round(15000 * sf))), n_ev),
                        )
                        if skew
                        # one hot user with ~50% of events: session /
                        # stateful-stream state skew
                        else rng.integers(
                            0, max(15, int(round(15000 * sf))), n_ev
                        )
                    ),
                    pa.int64(),
                ),
                "event_type": pa.array(
                    rng.choice(
                        ["view", "click", "purchase", "signup", "error"], n_ev
                    )
                ),
                "value": pa.array(np.round(rng.exponential(80.0, n_ev), 2)),
                "props": pa.array(
                    [f'{{"k": {int(k)}}}' for k in rng.integers(0, 100, n_ev)]
                ),
            }
        ),
        os.path.join(out_dir, "events.parquet"),
    )
    counts["events"] = n_ev
    return counts


def main() -> None:
    sf = float(sys.argv[1])
    out_dir = sys.argv[2]
    extra = sys.argv[3:]
    skew = "--skew" in extra
    only = None
    for a in extra:
        if a.startswith("--only="):
            only = set(a.split("=", 1)[1].split(","))
    os.makedirs(out_dir, exist_ok=True)
    parts = []
    if only is None or "documents" in only:
        parts.append(f"documents={gen_documents(out_dir, sf, skew=skew)}")
    if only is None or "lineitem" in only:
        parts.append(f"lineitem={gen_lineitem(out_dir, sf, skew=skew)}")
    if only is None or "embeddings" in only:
        parts.append(f"embeddings={gen_embeddings(out_dir, sf, skew=skew)}")
    if only is None or "dimensions" in only:
        dims = gen_dimensions(out_dir, sf, skew=skew)
        parts.append(" ".join(f"{k}={v}" for k, v in dims.items()))
    print(
        f"wrote {out_dir}{' (skewed)' if skew else ''}: " + " ".join(parts)
    )


if __name__ == "__main__":
    main()
