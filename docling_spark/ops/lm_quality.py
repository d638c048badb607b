"""CCNet-style language-model quality scoring (unigram perplexity buckets).

CCNet (Wenzek et al., arXiv 1911.00359) scores each document by the
perplexity of a LM trained on a trusted reference corpus (Wikipedia) and
splits the crawl into head/middle/tail buckets; training pipelines then
keep head+middle. The 5-gram KenLM is replaced here by a unigram model —
the *pipeline* shape (train on reference → broadcast the table → score
every doc → bucket) is identical and NN-free.

Scale shape:
- training is one word-count aggregation over the reference slice
  (shuffle = |vocab| after map-side combine), the grand total via a
  1-row broadcast;
- scoring explodes tokens (rows stay in their input partition),
  broadcast-joins the LM table (real tables are ~10^6 rows — comfortably
  broadcastable), and re-collapses per doc with a map-side partial agg:
  ONE slim exchange of (doc_id, n, sum) rows, no corpus re-shuffle;
- logprobs are quantized to 1/1024 at train time, so score sums are
  EXACT dyadic arithmetic — identical in any addition order and across
  engines (the DuckDB oracle re-derives the same table bit-for-bit).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

OOV_NLL = 16.0  # unseen-token penalty, ~e^-16 mass
QUANT = 1024  # logprob quantization denominator (dyadic => exact sums)


def train_unigram_lm(ref_docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(token, nll) from a trusted reference slice: nll = ln(total/count),
    quantized to 1/QUANT. The CCNet 'train on Wikipedia' step."""
    words = ref_docs.select(
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token")
    ).filter(F.col("token") != "")
    counts = words.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            "token",
            (
                F.round(F.log(F.col("total") / F.col("cnt")) * QUANT, 0) / QUANT
            ).alias("nll"),
        )
    )


def lm_score(
    docs: DataFrame,
    lm: DataFrame,
    text_col: str = "text",
    oov_nll: float = OOV_NLL,
    head: float = 6.0,
    tail: float = 9.0,
) -> DataFrame:
    """(doc_id, n_tokens, avg_nll, bucket) per doc; bucket =
    head (< ``head``) / middle / tail (>= ``tail``) on mean token NLL
    (monotone in unigram perplexity). Docs whose text tokenizes to
    nothing produce no row (the corpus contract guarantees tokens)."""
    tokens = docs.select(
        "doc_id",
        F.explode(F.split(F.lower(F.col(text_col)), r"\s+")).alias("token"),
    ).filter(F.col("token") != "")
    scored = (
        tokens.join(F.broadcast(lm), "token", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.coalesce("nll", F.lit(oov_nll))).alias("sum_nll"),
        )
    )
    avg = F.col("sum_nll") / F.col("n_tokens")
    return scored.select(
        "doc_id",
        "n_tokens",
        avg.alias("avg_nll"),
        F.when(avg < head, "head")
        .when(avg < tail, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
