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

    def __getitem__(self, i: int):
        """positional element access (pandas ``.str[i]``): array
        element for list-typed series (e.g. after split), character
        for strings. Negative indices supported (element_at / substr
        from the end)."""
        if self._s.dtype.startswith("array"):
            return self._new(F.element_at(self._c, i + 1 if i >= 0 else i))
        if i >= 0:
            return self._new(F.substring(self._c, i + 1, 1))
        return self._new(F.substring(self._c, F.length(self._c) + i + 1, F.lit(1)))

    def get(self, i: int):
        return self[i]

    def lower(self): return self._new(F.lower(self._c))
    def upper(self): return self._new(F.upper(self._c))
    def strip(self): return self._new(F.trim(self._c))
    def lstrip(self): return self._new(F.ltrim(self._c))
    def rstrip(self): return self._new(F.rtrim(self._c))
    def len(self):
        """string length, or element count for list-typed cells
        (pandas .str.len covers both)."""
        if self._s.dtype.startswith("array"):
            return self._new(F.size(self._c))
        return self._new(F.length(self._c))
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

    def rsplit(self, pat: str = " ", n: int = -1):
        """split from the RIGHT keeping at most n+1 parts (pandas
        rsplit; literal separator only — the head re-joins with pat).
        JVM array ops, no UDF."""
        parts = F.split(self._c, F.lit(pat))
        if n is None or n < 0:
            return self._new(parts)
        sz = F.size(parts)
        head = F.array_join(F.slice(parts, 1,
                                    F.greatest(sz - n, F.lit(1))), pat)
        tail = F.when(sz > n, F.slice(parts, F.greatest(sz - n, F.lit(1)) + 1,
                                      F.least(F.lit(n), sz - 1)))\
            .otherwise(F.expr("array()"))
        out = F.when(self._c.isNull(), F.lit(None).cast("array<string>"))\
            .otherwise(F.concat(F.array(head), tail))
        return self._new(out)

    def normalize(self, form: str = "NFC"):
        """unicode normalization (pandas str.normalize) — no JVM
        builtin, so Arrow-batched unicodedata (documented UDF path)."""
        import unicodedata
        _u = F.pandas_udf(
            lambda s: s.map(lambda v: unicodedata.normalize(form, v)
                            if v is not None else None), "string")
        return self._new(_u(self._c))

    def pad(self, width: int, side: str = "left", fillchar: str = " "):
        fn = F.lpad if side == "left" else F.rpad
        return self._new(fn(self._c, width, fillchar))

    def zfill(self, width: int): return self._new(F.lpad(self._c, width, "0"))
    def cat(self, other=None, sep: str = ""):
        """pairwise concat with another column; with other=None the
        pandas REDUCTION form — join every value into one string
        (sorted for a deterministic distributed order)."""
        if other is None:
            from ..collection import Scalar
            agg = F.array_join(F.array_sort(F.collect_list(self._c)), sep)
            return Scalar(self._s._anchor.select(agg.alias("cat")))
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
    # -- batch 3: completes the reference's _str_accessor.py:22-75 list
    #    (remaining Spark-expressible names; decode/encode/translate-with-
    #    dict/wrap stay out: bytes or dict-typed args, see COVERAGE.md) --
    def casefold(self): return self._new(F.lower(self._c))

    def center(self, width: int, fillchar: str = " "):
        # CPython parity rule (str.center): left = marg//2 + (marg & width & 1)
        # — e.g. 'a'.center(4,'-') == '-a--' but 'ab'.center(5,'-') == '--ab-'
        n = F.length(self._c)
        marg = F.lit(width) - n
        left = F.floor(marg / 2).cast("int") + \
            marg.cast("int").bitwiseAND(F.lit(width)).bitwiseAND(F.lit(1))
        padded = F.when(
            n >= width, self._c
        ).otherwise(
            F.rpad(F.lpad(self._c, (n + left).cast("int"), fillchar),
                   width, fillchar)
        )
        return self._new(padded)

    def ljust(self, width: int, fillchar: str = " "):
        # Spark's rpad truncates strings longer than width; pandas does not
        return self._new(
            F.when(F.length(self._c) >= width, self._c)
            .otherwise(F.rpad(self._c, width, fillchar))
        )

    def rjust(self, width: int, fillchar: str = " "):
        return self._new(
            F.when(F.length(self._c) >= width, self._c)
            .otherwise(F.lpad(self._c, width, fillchar))
        )

    def findall(self, pat: str):
        return self._new(F.regexp_extract_all(self._c, F.lit(pat), F.lit(0)))

    def extractall(self, pat: str, group: int = 1):
        return self._new(F.regexp_extract_all(self._c, F.lit(pat), F.lit(group)))

    def match(self, pat: str):
        # pandas: match at string START (not full string)
        p = pat if pat.startswith("^") else f"^{pat}"
        return self._new(self._c.rlike(p))

    def fullmatch(self, pat: str):
        p = pat if pat.startswith("^") else f"^{pat}"
        p = p if p.endswith("$") else f"{p}$"
        return self._new(self._c.rlike(p))

    def index(self, sub: str):
        # like find, but pandas raises on miss — lazily we return -1
        # (a distributed engine can't raise per-row at build time)
        return self._new(F.instr(self._c, sub) - 1)

    def rindex(self, sub: str):
        return self.rfind(sub)

    def isdecimal(self): return self._new(self._c.rlike(r"^[0-9]+$"))
    def isnumeric(self): return self._new(self._c.rlike(r"^[0-9]+$"))

    def istitle(self):
        return self._new(
            self._c.rlike(r"^([A-Z][a-z]*)(\s+[A-Z][a-z]*)*$")
        )

    def translate(self, table, to_str: str | None = None):
        """char translate. Spark-style (from_str, to_str) OR a pandas
        ordinal dict (str.maketrans style): single-char / None values
        compile to one JVM F.translate (None deletes); multi-char
        replacement values fall back to an Arrow-batched str.translate
        (exact pandas semantics)."""
        if isinstance(table, str):
            return self._new(F.translate(self._c, table, to_str))
        norm = {}
        for k, v in table.items():
            kc = chr(k) if isinstance(k, int) else k
            norm[kc] = "" if v is None else (chr(v) if isinstance(v, int) else v)
        if all(len(v) <= 1 for v in norm.values()):
            # F.translate deletes chars whose position exceeds len(to):
            # order the deletions last
            items = sorted(norm.items(), key=lambda kv: kv[1] == "")
            src = "".join(k for k, _ in items)
            dst = "".join(v for _, v in items)
            return self._new(F.translate(self._c, src, dst))
        tbl = {ord(k): v for k, v in norm.items()}

        @F.pandas_udf("string")
        def _tr(s):
            return s.str.translate(tbl)

        return self._new(_tr(self._c))

    def wrap(self, width: int, **kwargs):
        """textwrap-exact line wrapping (pandas Series.str.wrap) —
        Arrow-batched; the one .str member whose semantics (textwrap's
        break/space rules) aren't regex-expressible bit-for-bit."""
        import textwrap

        w = textwrap.TextWrapper(width=width, **kwargs)

        @F.pandas_udf("string")
        def _wrap(s):
            return s.map(lambda x: "\n".join(w.wrap(x)) if x is not None else None)

        return self._new(_wrap(self._c))

    def decode(self, encoding: str = "utf-8"):
        """binary → string (pandas Series.str.decode; JVM F.decode)."""
        return self._new(F.decode(self._c, encoding))

    def encode(self, encoding: str = "utf-8"):
        """string → binary (pandas Series.str.encode; JVM F.encode)."""
        return self._new(F.encode(self._c, encoding))

    def partition(self, sep: str = " "):
        """array<string> of [head, sep, tail] split at the FIRST sep
        (reference returns a 3-column frame; assign the parts from
        element_at)."""
        c, s = self._c, F.lit(sep)
        pos = F.instr(c, sep)
        return self._new(
            F.when(pos > 0, F.array(
                F.substring(c, F.lit(1), pos - 1),
                s,
                F.substring(c, pos + F.length(s), F.lit(2**31 - 1)),
            )).otherwise(F.array(c, F.lit(""), F.lit("")))
        )

    def rpartition(self, sep: str = " "):
        c, s = self._c, F.lit(sep)
        # last occurrence via reversed search
        rpos = F.instr(F.reverse(c), F.reverse(s))
        pos = F.when(rpos > 0, F.length(c) - rpos - F.length(s) + 2).otherwise(F.lit(0))
        return self._new(
            F.when(pos > 0, F.array(
                F.substring(c, F.lit(1), pos - 1),
                s,
                F.substring(c, pos + F.length(s), F.lit(2**31 - 1)),
            )).otherwise(F.array(F.lit(""), F.lit(""), c))
        )

    def join(self, sep: str):
        """join an array<string> column's elements (pandas joins list-
        valued cells)."""
        return self._new(F.array_join(self._c, sep))

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
        return self._new((F.unix_micros(self._c.cast("timestamp")) % 1_000_000).cast("int"))
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

    # -- batch 3: completes the reference's _datetime.py:15-71 list
    #    (period/tz-object members stay out — no period dtype, tz is a
    #    session property on Spark; see COVERAGE.md) ---------------------
    # -- period family (reference: _datetime.py:4 ToPeriod/qyear/
    #    start_time/end_time). Spark has no period dtype, so the
    #    engine's documented divergence: to_period returns pandas-style
    #    period LABEL STRINGS ("2000-01", "2000Q1", …) and the
    #    start/end mapping is exposed as period_start/period_end
    #    timestamps — together they cover the common
    #    to_period("M")/("Q") groupby/resample uses without a new dtype.
    def to_period(self, freq: str = "M"):
        f = freq.upper().rstrip("S")
        c = self._c
        if f in ("M", "ME"):
            return self._new(F.date_format(c, "yyyy-MM"))
        if f in ("Q", "QE"):
            return self._new(F.concat_ws(
                "Q", F.year(c).cast("string"), F.quarter(c).cast("string")))
        if f in ("Y", "A", "YE"):
            return self._new(F.date_format(c, "yyyy"))
        if f == "D":
            return self._new(F.date_format(c, "yyyy-MM-dd"))
        if f == "W":
            # pandas weekly periods label the WEEK END (Sunday);
            # render "start/end" like pandas' str(Period)
            end = F.next_day(F.date_sub(F.to_date(c), 1), "Sun")
            return self._new(F.concat_ws(
                "/", F.date_format(F.date_sub(end, 6), "yyyy-MM-dd"),
                F.date_format(end, "yyyy-MM-dd")))
        if f == "H":
            return self._new(F.date_format(c, "yyyy-MM-dd HH:00"))
        raise ValueError(f"unsupported period freq {freq!r}")

    def period_start(self, freq: str = "M"):
        """timestamp of the period's first instant (the usable analogue
        of Period.start_time on the label-string divergence)."""
        f = freq.upper().rstrip("S")
        unit = {"M": "month", "ME": "month", "Q": "quarter", "QE": "quarter",
                "Y": "year", "A": "year", "YE": "year", "D": "day",
                "W": "week", "H": "hour"}.get(f)
        if unit is None:
            raise ValueError(f"unsupported period freq {freq!r}")
        return self._new(F.date_trunc(unit, self._c))

    def period_end(self, freq: str = "M"):
        """timestamp of the period's last microsecond (Period.end_time
        analogue): next period start minus 1µs."""
        f = freq.upper().rstrip("S")
        start = self.period_start(freq)._scol
        step = {"M": (1, "month"), "ME": (1, "month"), "Q": (3, "month"),
                "QE": (3, "month"), "Y": (12, "month"), "A": (12, "month"),
                "YE": (12, "month"), "D": (1, "day"), "W": (7, "day"),
                "H": (1, "hour")}[f]
        n, unit = step
        if unit == "month":
            nxt = F.to_timestamp(F.add_months(start, n))
        elif unit == "day":
            nxt = F.to_timestamp(F.date_add(start.cast("date"), n))
        else:
            nxt = start + F.expr("INTERVAL 1 HOUR")
        return self._new(nxt - F.expr("INTERVAL 1 MICROSECOND"))

    @property
    def qyear(self):
        """fiscal year of the quarter (reference _datetime.py qyear;
        calendar quarters here, so it equals the year)."""
        return self._new(F.year(self._c))

    @property
    def weekday(self): return self.dayofweek

    @property
    def day_of_week(self): return self.dayofweek

    @property
    def day_of_year(self): return self.dayofyear

    @property
    def daysinmonth(self): return self.days_in_month

    @property
    def weekofyear(self): return self.week

    @property
    def is_quarter_end(self):
        return self._new(
            F.to_date(self._c) == F.to_date(F.last_day(F.date_trunc("quarter", self._c) + F.expr("INTERVAL 2 MONTH")))
        )

    @property
    def is_year_end(self):
        return self._new((F.month(self._c) == 12) & (F.dayofmonth(self._c) == 31))

    @property
    def is_leap_year(self):
        y = F.year(self._c)
        return self._new((y % 4 == 0) & ((y % 100 != 0) | (y % 400 == 0)))

    @property
    def nanosecond(self):
        # timestamps are µs precision on Spark (ns parquet is read as
        # long at the source layer) → sub-µs part is always 0, matching
        # pandas on µs-resolution data
        return self._new((F.unix_micros(self._c.cast("timestamp")) % 1000000 % 1000) * 0)

    def isocalendar(self):
        """struct<year,week,day> (ISO 8601), mirroring the pandas frame.
        ISO year = calendar year of that week's THURSDAY (differs from
        year() for up to 3 days at each year boundary)."""
        isodow = (F.dayofweek(self._c) + 5) % 7 + 1
        thursday = F.date_add(F.to_date(self._c), (F.lit(4) - isodow).cast("int"))
        return self._new(
            F.struct(
                F.year(thursday).alias("year"),
                F.weekofyear(self._c).alias("week"),
                isodow.alias("day"),
            )
        )

    def ceil(self, freq: str):
        unit = {"D": "day", "H": "hour", "h": "hour", "T": "minute",
                "min": "minute", "S": "second"}.get(freq, freq)
        secs = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}[unit]
        floored = F.date_trunc(unit, self._c)
        # cast back to TIMESTAMP_NTZ: timestamp_seconds yields the
        # tz-aware type, parquet reads are NTZ; session tz is UTC so
        # the cast is an identity relabel
        return self._new(
            F.when(floored == self._c, self._c)
            .otherwise(
                F.timestamp_seconds(F.unix_timestamp(floored) + secs)
                .cast("timestamp_ntz")
            )
        )

    def round(self, freq: str):
        # pandas Timestamp.round rounds half to EVEN multiples of the
        # frequency (banker's rounding), not HALF_UP like Spark F.round;
        # done in exact integer microseconds so boundary ties are exact.
        unit = {"D": "day", "H": "hour", "h": "hour", "T": "minute",
                "min": "minute", "S": "second"}.get(freq, freq)
        secs = {"day": 86400, "hour": 3600, "minute": 60, "second": 1}[unit]
        p = secs * 1_000_000
        # cast: unix_micros rejects TIMESTAMP_NTZ (session tz is UTC,
        # so the cast is instant-preserving)
        t = F.unix_micros(self._c.cast("timestamp"))
        rem = F.pmod(t, F.lit(p))
        base = t - rem
        base_even = F.pmod(base, F.lit(2 * p)) == 0
        r = (
            F.when(rem * 2 < p, base)
            .when(rem * 2 > p, base + p)
            .otherwise(F.when(base_even, base).otherwise(base + p))
        )
        return self._new(F.timestamp_micros(r).cast("timestamp_ntz"))

    def tz_localize(self, tz: str):
        """interpret naive timestamps as wall-clock in tz → UTC instant."""
        return self._new(F.to_utc_timestamp(self._c, tz))

    def _interval_frac(self):
        """sub-second fraction of a day-time interval (extract SECOND
        keeps micros as a decimal; the long cast truncates them)."""
        sec = F.expr(f"extract(SECOND FROM {self._s._name})").cast("double")
        return sec - F.floor(sec)

    def total_seconds(self):
        """seconds in a day-time interval column (pandas timedelta).
        DayTimeInterval cannot cast to double — the long cast yields
        whole seconds; micros come from extract(SECOND)'s fraction
        (r3 fix: the old direct double cast raised AnalysisException
        on any real interval column)."""
        return self._new(self._c.cast("long").cast("double")
                         + self._interval_frac())

    # timedelta component members (pandas .dt on timedelta64; the
    # engine's timedelta analogue is DayTimeInterval — SURVEY §1.3)
    @property
    def days(self):
        return self._new(F.floor(self._c.cast("long") / 86400).cast("int"))

    @property
    def seconds(self):
        return self._new((self._c.cast("long") % 86400).cast("int"))

    @property
    def microseconds(self):
        return self._new(
            F.round(self._interval_frac() * 1000000).cast("int"))

    def components(self):
        """pandas ``.dt.components`` analogue for day-time interval
        columns (reference _datetime.py:25): a DataFrame of int
        columns (days, hours, minutes, seconds, milliseconds,
        microseconds, nanoseconds).  Pure lazy column math — fully
        distributed, unlike the two pandas-object escapes below.
        nanoseconds is constant 0: DayTimeInterval stores microsecond
        precision (SURVEY §1.3 timedelta mapping)."""
        from ..collection import DataFrame as _DF

        s = self._s
        t = self._c.cast("long")  # whole seconds, floor for negatives
        us = F.round(self._interval_frac() * 1000000).cast("long")
        cols = {
            "days": F.floor(t / 86400),
            "hours": F.floor(F.pmod(t, 86400) / 3600),
            "minutes": F.floor(F.pmod(t, 3600) / 60),
            "seconds": F.pmod(t, 60),
            "milliseconds": F.floor(us / 1000),
            "microseconds": F.pmod(us, 1000),
            "nanoseconds": F.lit(0),
        }
        return _DF(
            s._anchor.select(
                *s._index_cols,
                *(c.cast("int").alias(n) for n, c in cols.items())),
            s._index_cols, s._known_sorted)

    def to_pytimedelta(self):
        """driver-side pandas-object escape (reference _datetime.py:31):
        computes the Series and returns a numpy object array of
        datetime.timedelta.  Documented non-distributed converter —
        for cluster-scale use keep the interval column and the
        component members above."""
        import pandas as pd

        pser = pd.Series(self._s.compute())
        return pser.dt.to_pytimedelta()

    def to_pydatetime(self):
        """driver-side pandas-object escape (reference _datetime.py:28):
        computes the Series and returns a numpy object array of
        datetime.datetime.  Same non-distributed contract as
        to_pytimedelta."""
        import pandas as pd

        pser = pd.Series(self._s.compute())
        return pser.dt.to_pydatetime()


class CategoricalMethods:
    """pandas ``.cat`` accessor analogue (reference:
    CategoricalAccessor, _categorical.py:21).

    Spark has no categorical dtype; the engine's convention
    (SURVEY.md §1.3, same rule as ``DataFrame.categorize()``) is
    dictionary-encoding to dense int codes assigned in sorted-value
    order. ``categories`` therefore computes the distinct values —
    a driver round-trip bounded by the column's cardinality, exactly
    like the reference's ``as_known()`` (it, too, must compute the
    categories to know them)."""

    def __init__(self, series):
        self._s = series

    @property
    def known(self) -> bool:
        # categories are always derivable (computed, never stored)
        return True

    def as_known(self):
        return self._s

    def as_unknown(self):
        return self._s

    def _dict(self):
        from pyspark.sql.window import Window
        s = self._s
        return (
            s._anchor.select(s._scol.alias("__val"))
            .where(F.col("__val").isNotNull())
            .distinct()
            .withColumn(
                "__code",
                (F.row_number().over(Window.orderBy(F.col("__val"))) - 1).cast("int"),
            )
        )

    @property
    def codes(self):
        """dense int codes — explicit-category order when set
        (add/remove/set_categories), else sorted-value order; null →
        -1 (pandas convention). Explicit categories become a literal
        map (no job); derived ones a distinct-bounded broadcast."""
        from ..collection import Series
        s = self._s
        cats = self._explicit()
        if cats is not None:
            pairs = []
            for i, c in enumerate(cats):
                pairs.append(F.lit(c))
                pairs.append(F.lit(i))
            mapped = (F.coalesce(
                F.element_at(F.create_map(*pairs), s._scol), F.lit(-1))
                if cats else F.lit(-1))
            return s._new(mapped.cast("int").alias(s._name))
        joined = s._anchor.join(
            F.broadcast(self._dict()), s._scol == F.col("__val"), "left"
        ).drop("__val")
        return Series(
            joined, F.coalesce(F.col("__code"), F.lit(-1)).alias(s._name),
            s._name, s._index_cols, False,
        )

    @property
    def categories(self) -> list:
        """explicit category list when set, else sorted distinct
        non-null values (driver-side, like the reference's known
        categories index)."""
        cats = self._explicit()
        if cats is not None:
            return list(cats)
        return [r[0] for r in self._dict().select("__val").orderBy("__val").collect()]

    def rename_categories(self, new):
        """mapping {old: new} (lazy) or list aligned to sorted
        categories (computes the categories first)."""
        s = self._s
        if not isinstance(new, dict):
            cats = self.categories
            if len(new) != len(cats):
                raise ValueError(
                    f"new categories ({len(new)}) != existing ({len(cats)})"
                )
            new = dict(zip(cats, new))
        pairs = []
        for k, v in new.items():
            pairs.append(F.lit(k))
            pairs.append(F.lit(v))
        mapped = F.element_at(F.create_map(*pairs), s._scol)
        return s._new(F.coalesce(mapped, s._scol))

    def remove_unused_categories(self):
        """drops explicit categories not present in the data; with
        derived categories it is a no-op (none can be unused)."""
        if self._explicit() is None:
            return self._s
        present = set(self.categories) & set(
            r[0] for r in self._dict().select("__val").collect()
        )
        return self._restate(None, [c for c in self._explicit() if c in present])

    # -- explicit-category surface (reference: _categorical.py:21 —
    #    add/remove/set_categories, as_ordered/as_unordered).
    #    Spark has no categorical dtype; the engine normally DERIVES
    #    categories from the present values. These methods carry an
    #    explicit category list (and ordered flag) on the returned
    #    Series so accessor chains (`s.cat.set_categories(c).cat.codes`)
    #    honor pandas' category order and membership rules. The list is
    #    plan-side metadata only — no data movement until codes/
    #    categories are asked for.
    def _explicit(self):
        return getattr(self._s, "_cat_categories", None)

    def _restate(self, scol, cats, ordered=None):
        s = self._s
        out = s._new(scol) if scol is not None else s._new(s._scol)
        out._cat_categories = list(cats) if cats is not None else None
        out._cat_ordered = (ordered if ordered is not None
                            else getattr(s, "_cat_ordered", False))
        return out

    @property
    def ordered(self) -> bool:
        return getattr(self._s, "_cat_ordered", False)

    def as_ordered(self):
        return self._restate(None, self._explicit(), ordered=True)

    def as_unordered(self):
        return self._restate(None, self._explicit(), ordered=False)

    def add_categories(self, new):
        new = [new] if not isinstance(new, (list, tuple)) else list(new)
        cats = list(self.categories)
        dup = [c for c in new if c in cats]
        if dup:
            raise ValueError(f"new categories must not include old categories: {dup}")
        return self._restate(None, cats + new)

    def remove_categories(self, removals):
        removals = ([removals] if not isinstance(removals, (list, tuple))
                    else list(removals))
        cats = list(self.categories)
        missing = [c for c in removals if c not in cats]
        if missing:
            raise ValueError(f"removals must all be in old categories: {missing}")
        s = self._s
        scol = F.when(~s._scol.isin(removals), s._scol).alias(s._name)
        return self._restate(scol, [c for c in cats if c not in removals])

    def set_categories(self, new, ordered: bool | None = None):
        new = list(new)
        s = self._s
        scol = F.when(s._scol.isin(new), s._scol).alias(s._name)
        return self._restate(scol, new, ordered=ordered)


def period_label_to_timestamp(c, freq: str = "M", how: str = "start"):
    """Invert DatetimeOps.to_period's label strings back to timestamps
    (reference: FrameBase.to_timestamp, _collection.py:1910 — there a
    PeriodIndex conversion; here the documented label-string
    divergence).  how='start' gives the period's first instant,
    how='end' its last microsecond."""
    f = freq.upper().rstrip("S")
    if f in ("M", "ME"):
        start, step = F.to_timestamp(c, "yyyy-MM"), (1, "month")
    elif f in ("Q", "QE"):
        parts = F.split(c, "Q")
        start = F.to_timestamp(F.make_date(
            parts.getItem(0).cast("int"),
            (parts.getItem(1).cast("int") - 1) * 3 + 1, F.lit(1)))
        step = (3, "month")
    elif f in ("Y", "A", "YE"):
        start, step = F.to_timestamp(c, "yyyy"), (12, "month")
    elif f == "D":
        start, step = F.to_timestamp(c, "yyyy-MM-dd"), (1, "day")
    elif f == "H":
        start, step = F.to_timestamp(c, "yyyy-MM-dd HH:mm"), None
    elif f == "W":
        # labels are "start/end" date pairs
        parts = F.split(c, "/")
        start, step = F.to_timestamp(parts.getItem(0), "yyyy-MM-dd"), (7, "day")
    else:
        raise ValueError(f"unsupported period freq {freq!r}")
    if how == "start":
        return start
    if how != "end":
        raise ValueError("how must be 'start' or 'end'")
    if step is None:
        nxt = start + F.expr("INTERVAL 1 HOUR")
    elif step[1] == "month":
        nxt = F.to_timestamp(F.add_months(start, step[0]))
    else:
        nxt = F.to_timestamp(F.date_add(start.cast("date"), step[0]))
    return nxt - F.expr("INTERVAL 1 MICROSECOND")
