"""String / datetime accessor namespaces.

reference: .str accessor (/root/reference/dask_expr/_str_accessor.py:10,
method list :22-75) and .dt accessor (/root/reference/dask_expr/_datetime.py:4).
All elementwise → plain Spark column functions (JVM-side, codegen'd),
never Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class StringMethods:
    def __init__(self, series):
        self._s = series

    def _new(self, col):
        return self._s._new(col)

    @property
    def _c(self):
        return self._s._scol

    def lower(self): return self._new(F.lower(self._c))
    def upper(self): return self._new(F.upper(self._c))
    def strip(self): return self._new(F.trim(self._c))
    def lstrip(self): return self._new(F.ltrim(self._c))
    def rstrip(self): return self._new(F.rtrim(self._c))
    def len(self): return self._new(F.length(self._c))
    def capitalize(self): return self._new(F.initcap(self._c))

    def contains(self, pat: str, regex: bool = True):
        if regex:
            return self._new(self._c.rlike(pat))
        return self._new(self._c.contains(pat))

    def startswith(self, pat: str): return self._new(self._c.startswith(pat))
    def endswith(self, pat: str): return self._new(self._c.endswith(pat))

    def slice(self, start: int = 0, stop: int | None = None):
        length = (stop - start) if stop is not None else 2**31 - 1
        return self._new(F.substring(self._c, start + 1, length))

    def replace(self, pat: str, repl: str, regex: bool = True):
        if regex:
            return self._new(F.regexp_replace(self._c, pat, repl))
        return self._new(F.replace(self._c, F.lit(pat), F.lit(repl)))

    def extract(self, pat: str, group: int = 1):
        return self._new(F.regexp_extract(self._c, pat, group))

    def split(self, pat: str = r"\s+", regex: bool = True):
        return self._new(F.split(self._c, pat if regex else F.lit(pat)))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        fn = F.lpad if side == "left" else F.rpad
        return self._new(fn(self._c, width, fillchar))

    def zfill(self, width: int): return self._new(F.lpad(self._c, width, "0"))
    def cat(self, other, sep: str = ""):
        return self._new(F.concat_ws(sep, self._c, other._scol))
    def count(self, pat: str):
        return self._new(F.expr(f"size(regexp_extract_all({self._s._name}, '{pat}', 0))"))
    def isalpha(self): return self._new(self._c.rlike("^[A-Za-z]+$"))
    def isdigit(self): return self._new(self._c.rlike("^[0-9]+$"))
    def isalnum(self): return self._new(self._c.rlike("^[A-Za-z0-9]+$"))
    def isspace(self): return self._new(self._c.rlike("^\\s+$"))
    def isupper(self): return self._new(self._c == F.upper(self._c))
    def islower(self): return self._new(self._c == F.lower(self._c))
    def title(self): return self._new(F.initcap(self._c))
    def swapcase(self):
        return self._new(
            F.concat_ws(
                "",
                F.transform(
                    F.split(self._c, ""),
                    lambda ch: F.when(ch == F.upper(ch), F.lower(ch)).otherwise(F.upper(ch)),
                ),
            )
        )
    def repeat(self, n: int): return self._new(F.repeat(self._c, n))
    def find(self, sub: str): return self._new(F.instr(self._c, sub) - 1)
    def rfind(self, sub: str):
        return self._new(
            F.length(self._c) - F.instr(F.reverse(self._c), sub[::-1])
            - F.lit(len(sub) - 1)
        )
    def get(self, i: int):
        """character at position i (pandas str.get)."""
        return self._new(F.substring(self._c, i + 1, 1))
    def removeprefix(self, prefix: str):
        return self._new(
            F.when(self._c.startswith(prefix),
                   F.expr(f"substring({self._s._name}, {len(prefix) + 1})"))
            .otherwise(self._c)
        )
    def removesuffix(self, suffix: str):
        return self._new(
            F.when(self._c.endswith(suffix),
                   F.substring(self._c, 1, F.length(self._c) - len(suffix)))
            .otherwise(self._c)
        )
    def slice_replace(self, start: int, stop: int, repl: str):
        return self._new(
            F.concat(
                F.substring(self._c, 1, start),
                F.lit(repl),
                F.expr(f"substring({self._s._name}, {stop + 1})"),
            )
        )
    def normalize_whitespace(self):
        """collapse runs of whitespace (cleaning helper, beyond pandas)."""
        return self._new(F.trim(F.regexp_replace(self._c, r"\s+", " ")))
    def reverse(self): return self._new(F.reverse(self._c))


class DatetimeMethods:
    def __init__(self, series):
        self._s = series

    def _new(self, col):
        return self._s._new(col)

    @property
    def _c(self):
        return self._s._scol

    @property
    def year(self): return self._new(F.year(self._c))
    @property
    def month(self): return self._new(F.month(self._c))
    @property
    def day(self): return self._new(F.dayofmonth(self._c))
    @property
    def hour(self): return self._new(F.hour(self._c))
    @property
    def minute(self): return self._new(F.minute(self._c))
    @property
    def second(self): return self._new(F.second(self._c))
    @property
    def dayofweek(self):
        # pandas: Monday=0 … Sunday=6; Spark dayofweek: Sunday=1 … Saturday=7
        return self._new((F.dayofweek(self._c) + 5) % 7)
    @property
    def dayofyear(self): return self._new(F.dayofyear(self._c))
    @property
    def quarter(self): return self._new(F.quarter(self._c))
    @property
    def date(self): return self._new(F.to_date(self._c))
    @property
    def week(self): return self._new(F.weekofyear(self._c))

    @property
    def days_in_month(self): return self._new(F.dayofmonth(F.last_day(self._c)))
    @property
    def is_month_start(self): return self._new(F.dayofmonth(self._c) == 1)
    @property
    def is_month_end(self):
        return self._new(F.to_date(self._c) == F.last_day(self._c))
    @property
    def is_quarter_start(self):
        return self._new(
            (F.dayofmonth(self._c) == 1) & (F.month(self._c) % 3 == 1)
        )
    @property
    def is_year_start(self): return self._new(F.dayofyear(self._c) == 1)
    @property
    def microsecond(self):
        return self._new((F.unix_micros(self._c) % 1_000_000).cast("int"))
    @property
    def epoch_seconds(self): return self._new(F.unix_timestamp(self._c))
    @property
    def day_name(self): return self._new(F.date_format(self._c, "EEEE"))
    @property
    def month_name(self): return self._new(F.date_format(self._c, "MMMM"))
    @property
    def time(self): return self._new(F.date_format(self._c, "HH:mm:ss"))

    def normalize(self):
        """truncate to midnight (pandas dt.normalize)."""
        return self._new(F.date_trunc("day", self._c))

    def tz_convert(self, tz: str):
        return self._new(F.from_utc_timestamp(self._c, tz))

    def floor(self, freq: str):
        unit = {"D": "day", "H": "hour", "h": "hour", "T": "minute",
                "min": "minute", "W": "week", "M": "month", "Y": "year",
                "Q": "quarter", "S": "second"}.get(freq, freq)
        return self._new(F.date_trunc(unit, self._c))

    def strftime(self, fmt: str):
        # pandas %Y-%m-%d → Spark yyyy-MM-dd for the common cases
        mapping = {"%Y": "yyyy", "%m": "MM", "%d": "dd", "%H": "HH",
                   "%M": "mm", "%S": "ss"}
        for k, v in mapping.items():
            fmt = fmt.replace(k, v)
        return self._new(F.date_format(self._c, fmt))
