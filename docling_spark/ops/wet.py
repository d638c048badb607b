"""WET export: Common Crawl's conversion-record format as a sink law.

The interchange format downstream consumers actually read: each
extracted document becomes a ``WARC-Type: conversion`` record —
header block, blank line, the plain text, double newline. Serializing
it as a pure string projection makes the sink an ordinary column
(write it as one-record-per-row text/parquet, or concat per partition
into .wet members), keeps it testable against a value oracle, and
costs zero Python.

Law fixed for engine parity: CRLF line ends in the header (the WARC
spec), ``WARC-Date`` = the second-truncated ISO form of ``warc_ts``,
``WARC-Record-ID`` = a deterministic ``urn:md5`` of url@date (the
spec wants a unique id, not a random one — determinism keeps retries
and both engines byte-identical), ``Content-Length`` = BYTE length of
the text (octet_length / DuckDB strlen).

Scale shape: one in-row projection, zero shuffles, zero Python; the
record column is written by the normal chunked job sink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["wet_records", "wet_records_oracle_sql"]

_CRLF = "\r\n"


def wet_records(pages: DataFrame) -> DataFrame:
    """(url, warc_ts, text) → (url, wet_record, record_bytes)."""
    date = F.date_format("warc_ts", "yyyy-MM-dd'T'HH:mm:ss'Z'")
    rid = F.concat(
        F.lit("<urn:md5:"),
        F.md5(F.concat(F.col("url"), F.lit("@"), date)),
        F.lit(">"),
    )
    record = F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), F.col("url"), F.lit(_CRLF),
        F.lit("WARC-Date: "), date, F.lit(_CRLF),
        F.lit("WARC-Record-ID: "), rid, F.lit(_CRLF),
        F.lit("Content-Type: text/plain" + _CRLF),
        F.lit("Content-Length: "),
        F.octet_length("text").cast("string"),
        F.lit(_CRLF + _CRLF),
        F.col("text"),
        F.lit("\n\n"),
    )
    return pages.select(
        "url",
        record.alias("wet_record"),
        F.octet_length(record).alias("record_bytes"),
    )


def wet_records_oracle_sql(pages_cte: str) -> str:
    """DuckDB mirror over a (url, warc_ts, text) CTE body."""
    crlf = "chr(13) || chr(10)"
    date = "strftime(warc_ts, '%Y-%m-%dT%H:%M:%SZ')"
    rec = f"""
        'WARC/1.0' || {crlf} ||
        'WARC-Type: conversion' || {crlf} ||
        'WARC-Target-URI: ' || url || {crlf} ||
        'WARC-Date: ' || {date} || {crlf} ||
        'WARC-Record-ID: ' || '<urn:md5:' ||
          md5(url || '@' || {date}) || '>' || {crlf} ||
        'Content-Type: text/plain' || {crlf} ||
        'Content-Length: ' || CAST(strlen(text) AS VARCHAR) ||
          {crlf} || {crlf} ||
        text || chr(10) || chr(10)"""
    return f"""
        WITH pages AS ({pages_cte})
        SELECT url,
               {rec} AS wet_record,
               CAST(strlen({rec}) AS BIGINT) AS record_bytes
        FROM pages
    """
