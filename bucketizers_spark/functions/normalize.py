"""The reference's normalize() scalar function (S7), two execution tiers.

Reference chain (SubstringBucketizer.ts:119-125 / SubjectPageBucketizer.ts:98-103):
trim → NFKD → strip combining marks U+0300–U+036F → strip [,'] →
('-'→' ' substring variant / '#'→'-' subject variant) → lowercase.

Execution tiers:
- ``ascii_fast=True`` (default): pure JVM expression chain (whole-stage
  codegen, no Python). NFKD is the identity on ASCII, so for ASCII-domain
  columns (ids, URLs, token keys) this is bit-exact AND fast — the right
  default at 100 TB.
- ``ascii_fast=False``: vectorized pandas UDF doing real NFKD via Python
  ``unicodedata`` (Arrow-batched; still no per-row Python loop — the
  normalization is applied on pandas Series). Needed only when values can
  carry combining marks / compatibility forms.

Both tiers are pinned against the oracle's ``normalize_*`` in tests.
"""

from __future__ import annotations

import unicodedata

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


def _native_chain(col: Column, mode: str) -> Column:
    out = F.lower(F.regexp_replace(F.trim(col), "[,']", ""))
    if mode == "substring":
        return F.translate(out, "-", " ")
    return F.translate(out, "#", "-")


def _py_normalize(s: pd.Series, mode: str) -> pd.Series:
    s = s.str.strip().map(
        lambda x: unicodedata.normalize("NFKD", x) if x is not None else None
    )
    s = s.str.replace("[\u0300-\u036f]", "", regex=True)
    s = s.str.replace("[,']", "", regex=True)
    if mode == "substring":
        s = s.str.replace("-", " ", regex=False)
    else:
        s = s.str.replace("#", "-", regex=False)
    return s.str.lower()


_UDF_CACHE: dict[str, object] = {}


def _get_udf(mode: str):
    # pandas_udf needs an active SparkSession to parse the return type, so
    # the UDFs are created lazily on first use, not at import time
    if mode not in _UDF_CACHE:

        def make(m: str):
            @pandas_udf("string")
            def _udf(s: pd.Series) -> pd.Series:
                return _py_normalize(s, m)

            return _udf

        _UDF_CACHE[mode] = make(mode)
    return _UDF_CACHE[mode]


def normalize_substring_col(col: Column, ascii_fast: bool = True) -> Column:
    if ascii_fast:
        return _native_chain(col, "substring")
    return _get_udf("substring")(col)


def normalize_subject_col(col: Column, ascii_fast: bool = True) -> Column:
    if ascii_fast:
        return _native_chain(col, "subject")
    return _get_udf("subject")(col)
