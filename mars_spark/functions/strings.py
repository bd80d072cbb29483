"""Series.str accessor — pandas string methods on Spark Columns.

Reference parity: mars/dataframe/base/string_.py:34 — Mars
auto-registers every method of ``pd.Series.str`` (string_.py:411-418)
and executes them with pandas per chunk. Spark-first, each method maps
to a JVM-side built-in (whole-stage codegen, no Python in the loop);
pandas regex semantics (``re`` syntax) map onto Java regex — the
compatible subset covers the common cases.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class StringAccessor:
    def __init__(self, series):
        self._s = series

    def __getattr__(self, name):
        """mars/dataframe/base/string_.py:411-418 — any other
        ``pd.Series.str`` method dispatches to the vectorized pandas
        fallback (swapcase, casefold, isnumeric, findall, wrap, …)."""
        if name.startswith("_"):
            raise AttributeError(name)
        import pandas as pd

        from mars_spark.functions._pandas_dispatch import accessor_fallback

        probe = pd.Series(["Ab1 c", "", "xyz9"], dtype="object")
        try:
            return accessor_fallback(self._s, "str", name, probe)
        except AttributeError:
            raise AttributeError(
                f"Series.str has no attribute {name!r}") from None

    def _wrap(self, col, name=None):
        from mars_spark.core.series import Series

        return Series(self._s._frame, col, name or self._s.name)

    # case
    def upper(self):
        return self._wrap(F.upper(self._s._col))

    def lower(self):
        return self._wrap(F.lower(self._s._col))

    def title(self):
        return self._wrap(F.initcap(self._s._col))

    def capitalize(self):
        # pandas: first char upper, REST lower — not per-word initcap
        c = self._s._col
        return self._wrap(F.concat(F.upper(F.substring(c, 1, 1)),
                                   F.lower(F.substring(c, 2, 2**31 - 1))))

    # predicates
    def contains(self, pat, regex: bool = True):
        if regex:
            return self._wrap(self._s._col.rlike(pat))
        return self._wrap(self._s._col.contains(pat))

    def startswith(self, pat):
        return self._wrap(self._s._col.startswith(pat))

    def endswith(self, pat):
        return self._wrap(self._s._col.endswith(pat))

    def match(self, pat):
        return self._wrap(self._s._col.rlike(f"^(?:{pat})"))

    def fullmatch(self, pat):
        return self._wrap(self._s._col.rlike(f"^(?:{pat})$"))

    def isdigit(self):
        return self._wrap(self._s._col.rlike(r"^[0-9]+$"))

    def isalpha(self):
        return self._wrap(self._s._col.rlike(r"^[A-Za-z]+$"))

    def isalnum(self):
        return self._wrap(self._s._col.rlike(r"^[A-Za-z0-9]+$"))

    def isspace(self):
        return self._wrap(self._s._col.rlike(r"^\s+$"))

    # transforms
    def strip(self, chars=None):
        if chars is None:
            return self._wrap(F.trim(self._s._col))
        return self._wrap(F.btrim(self._s._col, F.lit(chars)))

    def lstrip(self, chars=None):
        c = self._s._col
        if chars is None:
            return self._wrap(F.ltrim(c))
        return self._wrap(F.ltrim(F.lit(chars), c))

    def rstrip(self, chars=None):
        c = self._s._col
        if chars is None:
            return self._wrap(F.rtrim(c))
        return self._wrap(F.rtrim(F.lit(chars), c))

    def replace(self, pat, repl, regex: bool = True):
        if regex:
            return self._wrap(F.regexp_replace(self._s._col, pat, repl))
        return self._wrap(F.replace(self._s._col, F.lit(pat), F.lit(repl)))

    def slice(self, start=0, stop=None):
        length = (stop - start) if stop is not None else 2**31 - 1
        return self._wrap(F.substring(self._s._col, start + 1, length))

    def get(self, i: int):
        return self.slice(i, i + 1)

    def pad(self, width, side="left", fillchar=" "):
        fn = F.lpad if side == "left" else F.rpad
        return self._wrap(fn(self._s._col, width, fillchar))

    def zfill(self, width):
        # lpad truncates longer strings; pandas zfill never does
        c = self._s._col
        return self._wrap(
            F.when(F.length(c) >= width, c).otherwise(F.lpad(c, width, "0")))

    def len(self):
        return self._wrap(F.length(self._s._col))

    def split(self, pat=" ", regex: bool = False):
        import re as _re

        pattern = pat if regex else _re.escape(pat)
        return self._wrap(F.split(self._s._col, pattern))

    def cat(self, others=None, sep=""):
        cols = [self._s._col] + [o._col for o in (others or [])]
        return self._wrap(F.concat_ws(sep, *cols))

    def repeat(self, n):
        return self._wrap(F.repeat(self._s._col, n))

    def find(self, sub):
        return self._wrap(F.instr(self._s._col, sub) - 1)

    def extract(self, pat, group: int = 1):
        """mars/dataframe/base/string_.py:407 special-cases extract;
        Spark regexp_extract returns '' on no-match (pandas: NaN) —
        normalize to NULL for parity."""
        col = F.regexp_extract(self._s._col, pat, group)
        return self._wrap(F.when(col != "", col))

    def count(self, pat):
        return self._wrap(F.regexp_count(self._s._col, F.lit(pat)))

    def normalize_ws(self):
        """collapse whitespace runs — common text-pipeline primitive"""
        return self._wrap(F.trim(F.regexp_replace(self._s._col, r"\s+", " ")))
