"""Property-based parser tests (hypothesis): the Spark tokenizer agrees
with an independent Python reference implementation of the tokenization
contract on arbitrary generated lines — including quoted fields with
spaces, unicode, short/long rows."""

from __future__ import annotations

import re

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from s3logs_parquet_spark.functions.parse import TOKEN_PATTERN, tokenize

# independent reference tokenizer (python re, same contract)
_PY_TOKEN = re.compile(TOKEN_PATTERN)


def py_tokenize(line: str) -> list[str]:
    out = []
    for m in _PY_TOKEN.finditer(line):
        tok = m.group(0)
        if tok.startswith("[") or tok.startswith('"'):
            tok = tok[1:-1]
        out.append(tok)
    return out


# a bare token: no whitespace, quotes or brackets
bare = st.text(
    alphabet=st.characters(
        blacklist_categories=("Zs", "Cc", "Cs"), blacklist_characters='"[]'
    ),
    min_size=1,
    max_size=12,
)
# a quoted token's interior: anything but quotes (spaces allowed)
quoted = st.text(
    alphabet=st.characters(blacklist_categories=("Cc", "Cs"), blacklist_characters='"'),
    min_size=1,
    max_size=20,
).map(lambda s: f'"{s}"')
timefield = st.integers(min_value=0, max_value=2**31 - 1).map(
    lambda ts: __import__("s3logs_parquet_spark.testing", fromlist=["format_time"]).format_time(ts)
)

token = st.one_of(bare, quoted, timefield)
line_strategy = st.lists(token, min_size=0, max_size=30).map(" ".join)


@settings(max_examples=30, deadline=None)
@given(lines=st.lists(line_strategy, min_size=1, max_size=20))
def test_spark_tokenizer_matches_python_reference(spark, lines):
    df = spark.createDataFrame([(l,) for l in lines], ["value"])
    got = [r["t"] for r in df.select(tokenize(F.col("value")).alias("t")).collect()]
    expected = [py_tokenize(l) for l in lines]
    assert got == expected
