"""Unicode script mix (ops/scriptmix): known profiles per script,
dominance tie-break, and a cross-engine DuckDB check on NON-ASCII
text (the driver corpus is all-Latin, so the multi-script branches
are pinned here)."""

from __future__ import annotations

import duckdb
import pytest

from docling_spark.ops.scriptmix import (
    SCRIPT_RANGES,
    script_mix,
    script_mix_oracle_sql,
)

TEXTS = [
    (0, "plain latin text only"),
    (1, "Привет мир"),                      # cyrillic dominant
    (2, "γειά σου κόσμε"),                  # greek
    (3, "مرحبا بالعالم"),                   # arabic
    (4, "שלום עולם"),                       # hebrew
    (5, "नमस्ते दुनिया"),                    # devanagari
    (6, "你好世界"),                          # cjk
    (7, "こんにちは セカイ"),                  # kana
    (8, "안녕하세요 세계"),                    # hangul
    (9, "mixed Привет latin рус"),          # latin vs cyrillic counts
    (10, "1234 .,;: !!"),                   # no script chars at all
    (11, ""),                               # empty
    (12, "abСba"),                          # lookalike spam: С is cyrillic
]


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


@pytest.fixture(scope="module")
def rows(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    return {r["doc_id"]: r for r in script_mix(df).collect()}


def test_dominants(rows):
    exp = {
        0: "latin", 1: "cyrillic", 2: "greek", 3: "arabic", 4: "hebrew",
        5: "devanagari", 6: "cjk", 7: "kana", 8: "hangul", 9: "latin",
    }
    for i, name in exp.items():
        assert rows[i]["dominant_script"] == name, i
    assert rows[10]["dominant_script"] is None
    assert rows[10]["dominant_ratio"] is None
    assert rows[11]["n_script_chars"] == 0


def test_counts_and_lookalike(rows):
    assert rows[6]["cjk"] == 4 and rows[6]["n_script_chars"] == 4
    assert rows[6]["dominant_ratio"] == 1.0
    # 'abСba': 4 latin + 1 cyrillic lookalike — the mixed-script signal
    r = rows[12]
    assert r["latin"] == 4 and r["cyrillic"] == 1
    assert r["dominant_script"] == "latin"
    assert r["dominant_ratio"] == 0.8


def test_tie_break_first_range_wins(spark):
    # 2 latin + 2 cyrillic: latin is first in SCRIPT_RANGES
    df = spark.createDataFrame([(0, "abПр")], "doc_id long, text string")
    r = script_mix(df).collect()[0]
    assert r["latin"] == r["cyrillic"] == 2
    assert r["dominant_script"] == "latin"


def test_cross_engine_duckdb(spark):
    df = spark.createDataFrame(TEXTS, "doc_id long, text string")
    got = (
        script_mix(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .fillna({"dominant_script": ""})
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO documents VALUES (?, ?)", TEXTS)
    exp = (
        con.execute(script_mix_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .fillna({"dominant_script": ""})
    )
    for name, _ in SCRIPT_RANGES:
        assert list(got[name]) == list(exp[name]), name
    assert list(got["dominant_script"]) == list(exp["dominant_script"])
    for a, b in zip(got["dominant_ratio"], exp["dominant_ratio"]):
        assert (a != a and b != b) or a == b  # NaN-safe exact compare


def test_line_script_switches(spark):
    from docling_spark.ops.scriptmix import line_script_switches

    texts = [
        (0, "hello world\nПривет мир\nhello again\nПривет опять"),  # 3 switches
        (1, "hello\n\n   \nworld"),  # blanks transparent, same script
        (2, "hello\n12345\nПривет"),  # digit row transparent: 1 switch
        (3, "только русский текст"),  # single line
        (4, ""),  # empty
        (5, "123\n456"),  # nothing classified
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r["doc_id"]: r for r in line_script_switches(df).collect()}
    assert got[0]["n_switches"] == 3 and got[0]["is_code_switched"]
    assert got[1]["n_lines"] == 2 and got[1]["n_switches"] == 0
    assert got[2]["n_classified"] == 2 and got[2]["n_switches"] == 1
    assert got[3]["n_switches"] == 0 and not got[3]["is_code_switched"]
    assert got[4]["n_lines"] == 0 and got[4]["n_switches"] == 0
    assert got[5]["n_classified"] == 0 and got[5]["n_switches"] == 0


def test_line_script_switches_cross_engine(spark):
    from docling_spark.ops.scriptmix import (
        line_script_switches,
        line_script_switches_oracle_sql,
    )

    texts = [
        (0, "latin line\nПривет\nγειά\nlatin\n你好\n--\nשלום"),
        (1, "a\nb\nП\na\nП\na"),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = (
        line_script_switches(df)
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)", texts)
    exp = (
        con.execute(line_script_switches_oracle_sql())
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("n_lines", "n_classified", "n_switches", "is_code_switched"):
        assert list(got[c]) == list(exp[c]), c
