#!/usr/bin/env python
"""Adversarial-skew probe: the worst-case DATA SHAPES, not the worst-case
volume (scripts/scale_check.py covers volume with structure-linear
replicas; this harness does the opposite — small volume, pathological
distribution).

Derived corpus (from sf0.1):

- embeddings: n near-IDENTICAL vectors (one seeded base + 1e-4
  perturbations). Every vector lands in the SAME hyperplane-sign bucket
  of every LSH table — the degenerate case the expected-constant bucket
  argument (auto-scaled planes) cannot help with, and exactly the shape
  that made unbounded (|Q|, |I|) kernel allocations OOM in the r9 64x
  probe. The query-salted, budget-chunked kernel must complete and
  deliver k rows per query.
- documents: every row carries the SAME text — one md5 group holds the
  whole corpus (exact_dedup / dedup_cross_source hot group), and every
  minhash band bucket is the full corpus.
- lineitem: a fraction of rows remapped onto ONE hot l_orderkey — the
  skewed-join shape join_skew_salted's salting exists for.

Pass criteria are completion + output-contract checks (row counts), with
wall times recorded for the SCALECHECK narrative; correctness on skewed
data is already covered by the salted-vs-plain equality tests
(tests/test_ann_recall.py, tests/test_oracle_harness.py) — this probe
exists because those run at benign distributions.

Usage: python scripts/skew_check.py [--n-emb 20000] [--hot-frac 0.2]
Prints one JSON line: {"probes": {name: {"t": s, "rows": n}}, ...}
(--window-stress probes carry "t" only — they time full
materialization via the noop writer and verify no row count).
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pyspark.sql.functions as F  # noqa: E402

from etl_covid19_brasil_spark import get_spark, registry  # noqa: E402
from etl_covid19_brasil_spark.io import load_table  # noqa: E402

BASE = "/root/testdata/sf0.1"


def build_degenerate_dir(spark, n_emb: int, hot_frac: float) -> str:
    out = Path(tempfile.mkdtemp(prefix="skewcheck_"))

    # embeddings: one seeded base direction, all rows within 1e-4 of it —
    # identical sign signatures under any fixed hyperplane set with
    # overwhelming probability (|v0 . p| ~ 0.1 >> 1e-4).
    rng = np.random.default_rng(20260815)
    dim = len(
        load_table(spark, BASE, "embeddings").select("embedding").first()["embedding"]
    )
    v0 = rng.normal(size=dim)
    v0 /= np.sqrt((v0**2).sum())
    pert = rng.normal(scale=1e-4, size=(n_emb, dim))
    mat = v0[None, :] + pert
    import pandas as pd

    spark.createDataFrame(
        pd.DataFrame({"vec_id": np.arange(n_emb, dtype=np.int64), "embedding": list(mat)})
    ).write.mode("overwrite").parquet(str(out / "embeddings.parquet"))

    # documents: same text everywhere -> one exact-dup group, one minhash
    # bucket per band. Keep the base table's other columns so every
    # documents query still runs.
    docs = load_table(spark, BASE, "documents")
    one_text = docs.orderBy("doc_id").select("text").first()["text"]
    docs.select(
        "doc_id",
        F.lit(one_text).alias("text"),
        *[c for c in docs.columns if c not in ("doc_id", "text", "n_chars")],
    ).withColumn("n_chars", F.length("text").cast(dict(docs.dtypes)["n_chars"])).write.mode(
        "overwrite"
    ).parquet(str(out / "documents.parquet"))

    # lineitem: remap hot_frac of rows onto the smallest existing
    # orderkey — the orders side is untouched so the join stays valid,
    # one key now carries hot_frac of the fact table.
    li = load_table(spark, BASE, "lineitem")
    hot = li.agg(F.min("l_orderkey")).first()[0]
    li.withColumn(
        "l_orderkey",
        F.when(F.pmod(F.xxhash64("l_orderkey", "l_linenumber"), 1000) < int(hot_frac * 1000), F.lit(hot))
        .otherwise(F.col("l_orderkey")),
    ).write.mode("overwrite").parquet(str(out / "lineitem.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part", "orders", "events"):
        src = Path(BASE) / f"{t}.parquet"
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return str(out)


def build_hot_window_dir(spark, hot_frac: float) -> str:
    """Derived corpus for the WINDOW-family probe: ONE partition key owns
    ``hot_frac`` of the fact rows — the single-task-sort shape that volume
    replicas (scale_check.py) can never produce, because a window
    partition cannot be split by AQE the way a skewed join can.

    - orders: hot_frac of rows remapped onto one o_custkey (the
      win_running_sum / scd2_dimension_build partition key);
    - events: hot_frac of rows remapped onto one user_id (the
      win_sessionize_events partition key; events_active_users_rolling
      groups by day, so the hot user probes its distinct pre-aggregate).

    Rewriting events through Spark turns its TIMESTAMP(NANOS) column
    into plain micros — load_table passes that through unchanged.
    """
    out = Path(tempfile.mkdtemp(prefix="skewwin_"))
    o = load_table(spark, BASE, "orders")
    hot_cust = o.agg(F.min("o_custkey")).first()[0]
    o.withColumn(
        "o_custkey",
        F.when(
            F.pmod(F.xxhash64("o_orderkey"), 1000) < int(hot_frac * 1000),
            F.lit(hot_cust),
        ).otherwise(F.col("o_custkey")),
    ).write.mode("overwrite").parquet(str(out / "orders.parquet"))

    e = load_table(spark, BASE, "events")
    hot_user = e.agg(F.min("user_id")).first()[0]
    e.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64("event_id"), 1000) < int(hot_frac * 1000),
            F.lit(hot_user),
        ).otherwise(F.col("user_id")),
    ).write.mode("overwrite").parquet(str(out / "events.parquet"))

    for t in ("region", "nation", "customer", "supplier", "part", "lineitem",
              "documents", "embeddings"):
        src = Path(BASE) / f"{t}.parquet"
        dst = out / f"{t}.parquet"
        if src.is_dir():
            shutil.copytree(src, dst)
        else:
            shutil.copy(src, dst)
    return str(out)


WINDOW_QUERIES = (
    "win_running_sum",
    "win_running_sum_chunked",
    "win_moving_avg",
    "win_moving_avg_chunked",
    "scd2_dimension_build",
    "scd2_dimension_build_chunked",
    "win_sessionize_events",
    "win_sessionize_events_chunked",
    "events_active_users_rolling",
)


def run_window_probes(spark, specs, hot_frac: float) -> dict:
    """Time the window family on the hot-key corpus and assert the
    chunk-prefix rewrite is bit-identical to the plain window ON the
    adversarial shape itself (the sf-corpus equality is already oracle-
    checked; this is the shape the rewrite exists for)."""
    hot = build_hot_window_dir(spark, hot_frac)
    probes = {}
    for name in WINDOW_QUERIES:
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n = specs[name].spark(spark, hot).count()
        t = time.monotonic() - t0
        probes[name] = {"t": round(t, 2), "rows": n}
        print(f"# {name}: {t:.1f}s, {n} rows", file=sys.stderr)

    for plain_name, chunked_name, keys, vals in (
        ("win_running_sum", "win_running_sum_chunked",
         ["o_custkey", "o_orderkey"], ["running_spend"]),
        ("win_moving_avg", "win_moving_avg_chunked",
         ["o_custkey", "o_orderkey"], ["moving_avg_price"]),
        ("win_sessionize_events", "win_sessionize_events_chunked",
         ["user_id", "event_id"], ["session_seq"]),
        ("scd2_dimension_build", "scd2_dimension_build_chunked",
         ["o_custkey", "version"],
         ["priority", "valid_from", "valid_to", "is_current"]),
    ):
        plain = specs[plain_name].spark(spark, hot)
        chunked = specs[chunked_name].spark(spark, hot)
        mismatch = None
        for val in vals:
            cond = ~(
                F.col(f"p.{val}").eqNullSafe(F.col(f"c.{val}"))
            )
            mismatch = cond if mismatch is None else (mismatch | cond)
        diff = (
            plain.alias("p")
            .join(chunked.alias("c"), keys, "full")
            .filter(mismatch)
            .count()
        )
        if diff != 0:
            raise SystemExit(
                f"{chunked_name} diverges from {plain_name} on the "
                f"hot-key corpus: {diff} mismatched rows"
            )
        probes[f"{chunked_name}_vs_plain_mismatches"] = {"t": 0.0, "rows": diff}
    shutil.rmtree(hot, ignore_errors=True)
    return probes


def run_window_stress(spark, n_rows: int, shapes: str = "running_sum") -> dict:
    """The crossover measurement: ONE key owns ALL of an n_rows frame.
    The plain window funnels the whole sort through one task (one core
    of local[32]); the chunk-prefix rewrite spreads it across every
    partition. At probe sizes the rewrite should WIN wall-clock — the
    hot-key story is not only a memory bound. Bit-equality at this
    volume is already pinned by tests; here each variant is only TIMED
    (full materialization via the noop writer — no row count is
    verified; DataFrameWriter.save() returns None, and a count() would
    add an untimed second materialization for no signal).

    ``shapes`` (VERDICT r11 item 4): comma-separated subset of
    running_sum, moving_frame, sessionize, scd2 — each *_auto operator
    inherits CROSSOVER_HOT_ROWS from the running-sum measurement, so
    the other three shapes need their own plain-vs-chunked timing at
    the threshold to validate (or split) the shared constant. Event
    structure is deterministic per-row: sessionize's timestamps jump
    ~10s every 997 rows (sessions of ~997 events at gap_us=1s), scd2's
    value changes every 997 rows (~n/997 versions) — enough boundary
    churn to exercise the correction joins without an RNG.

    ARTIFACT SCHEMA CHANGE (r12, noted per ADVICE r12): results are
    nested PER SHAPE — ``out["running_sum"]["plain_window"]["t"]`` —
    where the pre-r12 single-shape output carried the flat keys
    ``out["plain_window"]`` / ``out["chunked"]``. SCALECHECK_r11 and
    earlier artifacts use the old flat layout; diff round-over-round
    accordingly (the default --shapes=running_sum output is the same
    measurement, one nesting level deeper).
    """
    import pyspark.sql.functions as F

    from etl_covid19_brasil_spark.operators.chunked_window import (
        chunked_moving_frame,
        chunked_running_sum,
        chunked_scd2,
        chunked_sessionize,
    )
    from pyspark.sql.window import Window

    df = spark.range(n_rows).select(
        F.lit(0).alias("k"),
        F.col("id").alias("seq"),
        F.pmod(F.xxhash64("id"), F.lit(1000)).alias("v"),
        F.timestamp_micros(
            F.col("id") * 1000 + (F.col("id") / 997).cast("long") * 10_000_000
        ).alias("ts"),
        ((F.col("id") / 997).cast("long") % 50).alias("val"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("seq")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wf = Window.partitionBy("k").orderBy("seq").rowsBetween(-99, 0)
    ws = Window.partitionBy("k").orderBy("ts", "seq")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(ws)
    sflag = F.when(gap.isNull() | (gap > 1_000_000), F.lit(1)).otherwise(F.lit(0))
    prev = F.lag("val").over(ws)
    cflag = F.when(prev.isNull() | (prev != F.col("val")), F.lit(1)).otherwise(F.lit(0))

    def plain_scd2():
        transitions = (
            df.withColumn("__f", cflag)
            .withColumn(
                "version",
                F.sum("__f").over(ws.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
            )
            .filter(F.col("__f") == 1)
            .select("k", "val", F.col("ts").alias("valid_from"), "version")
        )
        nxt = Window.partitionBy("k").orderBy("version")
        return transitions.withColumn("valid_to", F.lead("valid_from").over(nxt))

    variants = {
        "running_sum": (
            lambda: df.withColumn("rs", F.sum("v").over(w)),
            lambda: chunked_running_sum(df, keys=["k"], order=["seq"], value="v", out="rs"),
        ),
        "moving_frame": (
            lambda: df.withColumn("ms", F.sum("v").over(wf)).withColumn(
                "mc", F.count(F.lit(1)).over(wf)
            ),
            lambda: chunked_moving_frame(
                df, "k", ["seq"], "v", 100, out_sum="ms", out_cnt="mc"
            ),
        ),
        "sessionize": (
            lambda: df.withColumn("__f", sflag).withColumn(
                "sess",
                F.sum("__f").over(ws.rowsBetween(Window.unboundedPreceding, 0)).cast("long"),
            ).drop("__f"),
            lambda: chunked_sessionize(df, "k", "ts", "seq", 1_000_000, out="sess"),
        ),
        "scd2": (
            plain_scd2,
            lambda: chunked_scd2(df, "k", "val", "ts", "seq"),
        ),
    }
    out = {}
    for shape in shapes.split(","):
        plain, chunked = variants[shape]
        out[shape] = {}
        for name, build in (("plain_window", plain), ("chunked", chunked)):
            spark.sparkContext._jvm.System.gc()
            t0 = time.monotonic()
            build().write.format("noop").mode("overwrite").save()
            t = time.monotonic() - t0
            out[shape][name] = {"t": round(t, 2)}
            print(f"# window-stress {shape}/{name}: {t:.1f}s", file=sys.stderr)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-emb", type=int, default=20000)
    ap.add_argument("--hot-frac", type=float, default=0.2)
    ap.add_argument(
        "--window",
        action="store_true",
        help="probe the window family on a one-hot-partition-key corpus "
        "(default probes cover dedup/ANN/join shapes)",
    )
    ap.add_argument(
        "--window-hot-frac",
        type=float,
        default=0.5,
        help="fraction of fact rows owned by the single hot window key",
    )
    ap.add_argument(
        "--window-stress",
        type=int,
        default=0,
        metavar="N_ROWS",
        help="time plain vs chunked running sum on an all-one-key frame "
        "of N_ROWS rows (the single-task-sort crossover measurement)",
    )
    ap.add_argument(
        "--shapes",
        default="running_sum",
        help="comma-separated window-stress shapes: running_sum, "
        "moving_frame, sessionize, scd2 (VERDICT r11 item 4 — validate "
        "the shared CROSSOVER_HOT_ROWS per dispatcher shape)",
    )
    ap.add_argument(
        "--queries",
        default="ann_lsh_topk,exact_dedup,dedup_cross_source,join_skew_salted,near_dedup_minhash",
    )
    args = ap.parse_args()
    if args.window_stress:
        spark = get_spark(app_name="skew-check-window-stress")
        spark.sparkContext.setLogLevel("ERROR")
        probes = run_window_stress(spark, args.window_stress, args.shapes)
        print(json.dumps({"probes": probes, "n_rows": args.window_stress}))
        return
    if args.window:
        spark = get_spark(app_name="skew-check-window")
        spark.sparkContext.setLogLevel("ERROR")
        probes = run_window_probes(spark, registry.all_specs(), args.window_hot_frac)
        print(json.dumps({"probes": probes, "hot_frac": args.window_hot_frac}))
        return
    spark = get_spark(app_name="skew-check")
    spark.sparkContext.setLogLevel("ERROR")
    big = build_degenerate_dir(spark, args.n_emb, args.hot_frac)
    specs = registry.all_specs()
    probes = {}
    for name in args.queries.split(","):
        spark.sparkContext._jvm.System.gc()
        t0 = time.monotonic()
        n = specs[name].spark(spark, big).count()
        t = time.monotonic() - t0
        probes[name] = {"t": round(t, 2), "rows": n}
        print(f"# {name}: {t:.1f}s, {n} rows", file=sys.stderr)
        if name == "ann_lsh_topk":
            # contract on the degenerate cloud: every vector has >= k
            # near-perfect neighbors in its (only) bucket. k is the
            # query's own constant (not a probe-local literal) and the
            # check raises (assert would vanish under python -O).
            from etl_covid19_brasil_spark.queries.llm import ANN_LSH_TOPK_K

            if n != args.n_emb * ANN_LSH_TOPK_K:
                raise SystemExit(
                    f"ann_lsh_topk contract violated: {n} rows != "
                    f"{args.n_emb} queries * k={ANN_LSH_TOPK_K}"
                )
    print(json.dumps({"probes": probes, "n_emb": args.n_emb, "hot_frac": args.hot_frac}))
    shutil.rmtree(big, ignore_errors=True)


if __name__ == "__main__":
    main()
