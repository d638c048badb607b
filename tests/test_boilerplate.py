"""Site-template boilerplate strip (ops/boilerplate): law checks on a
hand-built corpus, tau boundary semantics, blank-line exemption,
min_docs guard, and a plan pin (no Python stage, no cartesian)."""

from __future__ import annotations

import pytest

from docling_spark.ops.boilerplate import strip_boilerplate


@pytest.fixture(scope="module")
def spark():
    from pyspark.sql import SparkSession

    s = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .getOrCreate()
    )
    s.sparkContext.setLogLevel("ERROR")
    yield s


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "doc_id long, domain string, wtext string")
    return {r["doc_id"]: r for r in strip_boilerplate(df, **kw).collect()}


def test_template_removed_everywhere_content_survives(spark):
    nav = "Home | About"
    rows = [
        (i, "a", f"{nav}\narticle {i} unique prose") for i in range(4)
    ]
    got = _run(spark, rows)
    for i in range(4):
        assert got[i]["clean_text"] == f"article {i} unique prose"
        assert got[i]["n_lines"] == 2 and got[i]["n_kept"] == 1


def test_tau_boundary_inclusive(spark):
    # promo on exactly 2 of 4 pages = tau 0.5 -> boilerplate (>=)
    rows = [
        (0, "a", "promo\nbody 0"),
        (1, "a", "promo\nbody 1"),
        (2, "a", "body 2"),
        (3, "a", "body 3"),
    ]
    got = _run(spark, rows, tau=0.5)
    assert got[0]["clean_text"] == "body 0"
    # just under: 2 of 5 pages < 0.5 -> survives
    rows.append((4, "a", "body 4"))
    got = _run(spark, rows, tau=0.5)
    assert got[0]["clean_text"] == "promo\nbody 0"


def test_min_docs_guard_small_sites_untouched(spark):
    rows = [
        (0, "tiny", "nav\nbody 0"),
        (1, "tiny", "nav\nbody 1"),
        (2, "tiny", "nav\nbody 2"),
    ]
    got = _run(spark, rows, min_docs=4)
    assert got[0]["clean_text"] == "nav\nbody 0"
    got = _run(spark, rows, min_docs=3)
    assert got[0]["clean_text"] == "body 0"


def test_domain_scoped_not_global(spark):
    # the same nav line on every page of site a, once on site b: removed
    # from a, kept on b (unlike para_dedup's global keep-first law)
    rows = [
        (0, "a", "nav\nbody 0"),
        (1, "a", "nav\nbody 1"),
        (2, "a", "nav\nbody 2"),
        (3, "b", "nav\nbody 3"),
        (4, "b", "other 4"),
        (5, "b", "other 5"),
    ]
    got = _run(spark, rows)
    assert got[0]["clean_text"] == "body 0"
    assert got[3]["clean_text"] == "nav\nbody 3"


def test_blank_lines_exempt_and_within_page_repeat_counts_once(spark):
    # "x" twice within doc 0 still counts doc 0 once: 1 of 3 docs < tau
    rows = [
        (0, "a", "x\n\nx\nbody 0"),
        (1, "a", "\nbody 1"),
        (2, "a", "\nbody 2"),
    ]
    got = _run(spark, rows)
    assert got[0]["clean_text"] == "x\n\nx\nbody 0"
    assert got[1]["clean_text"] == "\nbody 1"  # blanks never removed


def test_normalized_match_case_and_edges(spark):
    rows = [
        (0, "a", "  NAV  \nbody 0"),
        (1, "a", "nav\nbody 1"),
        (2, "a", "Nav \nbody 2"),
    ]
    got = _run(spark, rows)
    assert [got[i]["clean_text"] for i in range(3)] == [
        "body 0",
        "body 1",
        "body 2",
    ]


def test_plan_shape(spark):
    df = spark.createDataFrame(
        [(0, "a", "nav\nbody")], "doc_id long, domain string, wtext string"
    )
    plan = strip_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
