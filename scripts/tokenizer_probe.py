#!/usr/bin/env python
"""r16 probe — unigram-LM tokenizer EM economics, one quiet-box run,
one JSON line, consumed by SCALECHECK_r16.

The claim under test is the UNIQUE-WORD COLLAPSE: the E-step kernel's
work is O(unique words), not O(corpus tokens) — the one word-count
shuffle is the only stage that sees the corpus. Three synthetic
configurations (Zipf-weighted vocabularies, words 4-8 chars):

- base:   U=2,000 unique words, N=200,000 corpus tokens
- 8x N:   U=2,000,             N=1,600,000 (8x the corpus, SAME vocab)
- 8x U:   U=16,000,            N=200,000   (8x the vocab, same corpus)

If the collapse holds, one EM iteration's wall moves with U and stays
near-flat in N; Viterbi serving (also per-unique-word) behaves the
same. Measured numbers land in SCALECHECK_r16; corpus synthesis is
untimed setup.
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

CHARS = np.array(list("abcdefghijklmnopqrstuvwxyz"))


def _corpus(spark, n_vocab: int, n_tokens: int, seed: int, words_per_doc=100):
    rng = np.random.default_rng(seed)
    lens = rng.integers(4, 9, size=n_vocab)
    vocab = np.array(
        ["".join(rng.choice(CHARS, size=L)) for L in lens]
    )
    ranks = np.arange(1, n_vocab + 1, dtype=np.float64)
    p = (1.0 / ranks) / (1.0 / ranks).sum()  # Zipf weights
    toks = rng.choice(vocab, size=n_tokens, p=p)
    n_docs = n_tokens // words_per_doc
    texts = [
        " ".join(toks[i * words_per_doc : (i + 1) * words_per_doc])
        for i in range(n_docs)
    ]
    pdf = pd.DataFrame(
        {"doc_id": np.arange(n_docs, dtype=np.int64), "text": texts}
    )
    df = spark.createDataFrame(pdf).repartition(32).cache()
    df.count()
    return df


def main() -> None:
    from etl_covid19_brasil_spark.llm.tokenizer import (
        unigram_em_train,
        unigram_viterbi_segment,
    )

    spark = get_spark(app_name="tokenizer-probe", shuffle_partitions=32)
    # untimed warmup: the first Spark/Arrow jobs of a session carry
    # scheduler + Python-worker startup that would otherwise land
    # entirely on the first timed configuration
    warm = _corpus(spark, 500, 20_000, seed=7)
    unigram_em_train(warm, n_iters=1, top_multi=400)
    unigram_viterbi_segment(warm, top_multi=400).count()
    warm.unpersist()
    out = {}
    for name, n_vocab, n_tokens in [
        ("base", 2_000, 200_000),
        ("corpus_8x", 2_000, 1_600_000),
        ("vocab_8x", 16_000, 200_000),
    ]:
        docs = _corpus(spark, n_vocab, n_tokens, seed=13)
        from etl_covid19_brasil_spark.llm.tokenizer import _word_counts

        n_uniq = _word_counts(docs, "text", "doc_id")[1].count()  # realized
        t0 = time.perf_counter()
        fit = unigram_em_train(docs, n_iters=1, top_multi=400)
        em_sec = time.perf_counter() - t0
        t0 = time.perf_counter()
        n_rows = unigram_viterbi_segment(docs, top_multi=400).count()
        seg_sec = time.perf_counter() - t0
        out[name] = {
            "n_vocab": n_vocab,
            "n_uniq_realized": n_uniq,
            "n_tokens": n_tokens,
            "em_iter_sec": round(em_sec, 3),
            "segment_sec": round(seg_sec, 3),
            "ll": round(fit.log_likelihood[0], 1),
            "n_docs_out": n_rows,
        }
        docs.unpersist()
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
