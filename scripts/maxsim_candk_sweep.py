#!/usr/bin/env python
"""r16 probe (VERDICT r15 item 5) — cand_k knee for the rank_maxsim
prefilter on a SHARED-VOCABULARY corpus, one quiet-box run, one JSON
line, consumed by SCALECHECK_r16.

The 8x gate replica corpus renames tokens per replica (disjoint token
spaces — scripts/scale_check.py), which resolves LSH token-bucket
collisions artificially cleanly: SCALECHECK_r15 measured recall 1.000
there and flagged the number as corpus-shape-dependent. Every real
text corpus shares one vocabulary, so common tokens collide across ALL
documents and the collision-count cap (cand_k) is the recall-bearing
knob. This sweep builds Zipf-sampled docs over ONE vocabulary (the
worst honest shape for the prefilter) at 8x and 32x the gate document
count and measures recall of the prefiltered top-5 vs the exact scan
at cand_k in {16, 32, 64, 128}, plus wall-clock of each.
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from etl_covid19_brasil_spark import get_spark  # noqa: E402


def _zipf_corpus(spark, n_docs: int, vocab: int = 1500, doc_len: int = 8, seed: int = 5):
    """(doc_id, token) rows: each doc draws doc_len distinct tokens from
    a shared Zipf(1.1) vocabulary — heavy head tokens collide across
    most documents, the shape that makes bare bucket membership vacuous
    and the collision-count cap load-bearing."""
    rng = np.random.default_rng(seed)
    ranks = np.arange(1, vocab + 1, dtype=np.float64)
    p = ranks ** -1.1
    p /= p.sum()
    rows = []
    for d in range(n_docs):
        toks = rng.choice(vocab, size=doc_len * 2, replace=True, p=p)
        uniq = list(dict.fromkeys(toks.tolist()))[:doc_len]
        rows.extend((d, f"w{t}") for t in uniq)
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "token"])
    )


def _pairs(df) -> set:
    return {(int(r.query_doc), int(r.doc_id)) for r in df.toPandas().itertuples()}


def main() -> None:
    from etl_covid19_brasil_spark.llm.maxsim import maxsim_topk

    spark = get_spark(app_name="maxsim-candk-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    for label, n_docs in (("8x", 4000), ("32x", 16000)):
        toks = _zipf_corpus(spark, n_docs).cache()
        toks.count()
        t0 = time.perf_counter()
        scan = _pairs(maxsim_topk(toks, k=5, prefilter=False))
        sec_scan = round(time.perf_counter() - t0, 3)
        rows = {"n_docs": n_docs, "scan_sec": sec_scan, "cand_k": {}}
        for ck in (16, 32, 64, 128):
            t0 = time.perf_counter()
            pre = _pairs(maxsim_topk(toks, k=5, prefilter=True, cand_k=ck))
            sec = round(time.perf_counter() - t0, 3)
            rows["cand_k"][ck] = {
                "recall_vs_scan": round(len(pre & scan) / len(scan), 4),
                "sec": sec,
            }
        out[label] = rows
        print(f"# {label}: {rows}", file=sys.stderr)
        toks.unpersist()

    print(json.dumps(out))


if __name__ == "__main__":
    main()
