"""Composed end-to-end pipeline row (extraction → curation → dedup →
decontam → mix → pack): result-shape sanity + the plan audit that the
text/spans columns are computed once and never re-shuffled between
stages (VERDICT r4 'Next round' #6)."""

import re

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from docling_spark.job import tuned_session

    s = tuned_session(master="local[4]", shuffle_partitions=4)
    s.sparkContext.setLogLevel("ERROR")
    yield s


@pytest.fixture(scope="module")
def result(spark):
    import __spark_entry__ as entry

    df = entry.queries()["pipeline_e2e"](spark, "/root/testdata/sf0.01")
    rows = {r["doc_id"]: r for r in df.collect()}
    return df, rows


def test_dup_variants_resolve_to_one_canonical(result):
    _, rows = result
    # every doc was crawled twice (rid 2i and 2i+1, identical bytes):
    # the pair always lands in ONE component (LSH may additionally merge
    # genuinely similar distinct docs — that is candidate-band recall,
    # mirrored exactly by the oracle), and each component has exactly one
    # canonical rep: its min member
    assert len(rows) == 1000
    comps: dict[int, list[int]] = {}
    for rid, r in rows.items():
        comps.setdefault(r["component"], []).append(rid)
    for i in range(0, 1000, 2):
        assert rows[i]["component"] == rows[i + 1]["component"]
    for comp, members in comps.items():
        assert comp == min(members)
        for m in members:
            assert rows[m]["is_canonical"] == (m == comp)


def test_contamination_hits_eval_docs_and_their_variants(result):
    _, rows = result
    # every eval-set doc with a full 13-gram (and its duplicate variant)
    # must flag — no false negatives. Eval items SHORTER than 13 tokens
    # hash as full-sequence grams, which cannot match the corpus's
    # 13-token windows (the GPT-3 fixed-n limitation, mirrored by the
    # oracle). Other docs may flag too when the synthetic vocabulary
    # genuinely repeats a 13-gram across docs.
    import duckdb

    long_eval = {
        r[0]
        for r in duckdb.sql(
            "SELECT doc_id FROM"
            " read_parquet('/root/testdata/sf0.01/documents.parquet')"
            " WHERE doc_id % 37 = 0 AND len(list_filter("
            "string_split_regex(lower(text), '\\s+'), t -> t != '')) >= 13"
        ).fetchall()
    }
    assert long_eval  # the law must actually exercise the positive path
    for rid, r in rows.items():
        if rid // 2 in long_eval:
            assert r["contaminated"], rid
        assert r["contaminated"] == rows[rid ^ 1]["contaminated"]
    n_flagged = sum(1 for r in rows.values() if r["contaminated"])
    assert n_flagged < 500  # the dim must not blanket-flag the corpus


def test_keep_final_composition(result):
    _, rows = result
    for r in rows.values():
        expect = (
            r["curate_reason"] == "keep"
            and r["is_canonical"]
            and not r["contaminated"]
            and r["split"] is not None
        )
        assert r["keep_final"] == expect
    kept = [r for r in rows.values() if r["keep_final"]]
    # the pipeline must actually emit a non-trivial keep-list: canonical
    # reps exist (half the corpus), most are uncontaminated, en-rate is 1.0
    assert 0 < len(kept) < 500


def test_pack_stats_match_pack_chunks(spark):
    """pack_stats (in-row) must agree with chunk_spans+pack_chunks (the
    per-chunk fan-out + window path) on every document."""
    from docling_spark.job import extract_pages
    from docling_spark.ops.chunker import chunk_spans, pack_chunks, pack_stats
    from docling_spark.ops.corpus import synth_pages

    ex = extract_pages(
        synth_pages(spark, "/root/testdata/sf0.001"), base_uri_mode="none"
    ).persist()
    a = {
        r["url"]: (r["n_chunks"], r["n_tokens"], r["n_packs"])
        for r in pack_stats(ex, budget_tokens=16).collect()
    }
    via_packs = (
        pack_chunks(chunk_spans(ex), budget_tokens=16)
        .groupBy("url")
        .agg(
            F.sum("n_chunks").alias("n_chunks"),
            F.sum("n_tokens").alias("n_tokens"),
            F.count("*").alias("n_packs"),
        )
    )
    b = {
        r["url"]: (r["n_chunks"], r["n_tokens"], r["n_packs"])
        for r in via_packs.collect()
    }
    ex.unpersist()
    assert a == b


def test_pack_stats_property_vs_reference_fold(spark):
    """Property: for random chunk token counts (including over-budget
    chunks that SKIP pack ids), pack_stats' in-row arithmetic equals a
    pure-Python reference fold of pack_chunks' boundary rule."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from docling_spark.ops.chunker import pack_stats

    # one spark round-trip per example is too slow; generate a batch of
    # documents per example instead
    @settings(max_examples=8, deadline=None)
    @given(
        st.lists(
            st.lists(st.integers(min_value=1, max_value=60), min_size=1, max_size=8),
            min_size=1,
            max_size=6,
        ),
        st.integers(min_value=1, max_value=24),
    )
    def check(docs_tokens, budget):
        rows = []
        for d, toks in enumerate(docs_tokens):
            spans = [
                {
                    "idx": i,
                    "parent": -1,
                    "kind": "text",
                    "label": "text",
                    "text": " ".join(["w"] * n),  # n whitespace tokens
                    "content_layer": "body",
                }
                for i, n in enumerate(toks)
            ]
            rows.append((f"u{d}", spans))
        from docling_spark.schema import EXTRACTED_SCHEMA

        span_t = EXTRACTED_SCHEMA["spans"].dataType.simpleString()
        df = spark.createDataFrame(rows, f"url string, spans {span_t}")
        got = {
            r["url"]: (r["n_chunks"], r["n_tokens"], r["n_packs"])
            for r in pack_stats(df, budget_tokens=budget).collect()
        }
        for d, toks in enumerate(docs_tokens):
            cum, ids = 0, set()
            for n in toks:
                cum += n
                ids.add((cum - 1) // budget)
            assert got[f"u{d}"] == (len(toks), sum(toks), len(ids))

    check()


def test_pack_stats_null_spans_yield_zero_counts(spark):
    """A failed-extraction row (spans = NULL) must produce zero counts,
    never -1/null — one bad doc can't poison downstream accounting."""
    from docling_spark.ops.chunker import pack_stats
    from docling_spark.schema import EXTRACTED_SCHEMA

    span_t = EXTRACTED_SCHEMA["spans"].dataType.simpleString()
    df = spark.createDataFrame(
        [("u1", None)], f"url string, spans {span_t}"
    )
    r = pack_stats(df, budget_tokens=16).collect()[0]
    assert (r["n_chunks"], r["n_tokens"], r["n_packs"]) == (0, 0, 0)


def test_text_never_reshuffled_between_stages(spark, result):
    """Plan audit: exactly one extraction (MapInPandas) feeds a cache;
    every Exchange in the live plan carries only slim verdict/key columns
    — never extracted_text/wtext/spans/chunk text."""
    df, _ = result
    jvm = spark._jvm
    fmt = jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    live = fmt.split("InMemoryRelation")[0]
    # the composed plan reads the one cached extraction; stages do not
    # re-run the UDF
    assert live.count("MapInPandas") == 0, "stages must read the cache"
    # parse formatted sections: node header '(n) Exchange' followed by
    # 'Input [k]: [cols...]'
    bad = []
    for m in re.finditer(r"\(\d+\) Exchange\b.*?\nInput \[\d+\]: \[([^\]]*)\]", fmt, re.S):
        cols = m.group(1)
        for heavy in ("extracted_text", "wtext", "spans", "chunk_text"):
            if heavy in cols:
                bad.append(cols)
    assert not bad, bad
