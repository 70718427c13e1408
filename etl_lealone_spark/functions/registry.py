"""The scalar function catalog — every name the reference registers
(lealone-sql/src/main/java/org/lealone/sql/expression/function/
Function.java:83-120 constants, :188-381 registration), mapped to a
Spark Column builder.

Semantics notes (H2 heritage, mirrored here):
- LOG(x) is the NATURAL log (H2/reference semantics), LOG10 is decimal.
- ARRAY_GET is 1-based → element_at matches exactly.
- TRUNCATE(x, d) truncates toward zero (not round).
- MOD follows dividend sign (Java %), matching Spark's %.
- RAND(seed)/SECURE_RAND are nondeterministic — excluded from oracle
  workloads by construction.

Almost everything is a JVM built-in (codegen'd, vectorized); only the
handful in ``register_udfs`` drop to Python, and none of those sit in an
analytical hot path.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _c(x) -> Column:
    return x if isinstance(x, Column) else F.lit(x)


# ---------------------------------------------------------------------------
# builders for names that are not 1:1 pyspark functions
# ---------------------------------------------------------------------------
def _cot(x) -> Column:
    return 1.0 / F.tan(_c(x))


def _truncate(x, d=None) -> Column:
    if d is None:
        d = 0
    scale = F.pow(F.lit(10.0), _c(d))
    xx = _c(x)
    return (
        F.when(xx >= 0, F.floor(xx * scale) / scale)
        .otherwise(-(F.floor(-xx * scale) / scale))
    )


def _roundmagic(x) -> Column:
    """H2 ROUNDMAGIC: cancel float noise — round to 10 digits, snap
    near-zero to zero (reference MathUtils.roundMagic semantics)."""
    xx = _c(x)
    r = F.round(xx.cast("double"), 10)
    return F.when(F.abs(r) < 1e-10, F.lit(0.0)).otherwise(r)


def _bit_length(s) -> Column:
    return F.octet_length(_c(s)) * 8


def _insert(s, start, length, repl) -> Column:
    return F.overlay(_c(s), _c(repl), _c(start), _c(length))


def _hash(alg, data, iterations=None) -> Column:
    """HASH('SHA256', data[, iterations]) (Function.java HASH)."""
    out = _c(data)
    n = 1 if iterations is None else iterations
    if not isinstance(n, int):
        raise ValueError("HASH iterations must be a literal int")
    for _ in range(n):
        out = F.sha2(out.cast("binary"), 256)
    return out


def _encrypt(alg, key, data) -> Column:
    """ENCRYPT('AES', key, data) (Function.java ENCRYPT).

    Mapped to Spark's built-in ``aes_encrypt`` in ECB mode (deterministic,
    no IV — the reference's block cipher likewise derives no random IV).
    Key must be 16/24/32 bytes. Only AES is supported; the reference's
    XTEA/FOG ciphers are not (documented divergence)."""
    if isinstance(alg, str) and alg.upper() != "AES":
        raise NotImplementedError(f"ENCRYPT algorithm {alg!r}: only AES")
    return F.aes_encrypt(_c(data).cast("binary"), _c(key).cast("binary"), F.lit("ECB"))


def _decrypt(alg, key, data) -> Column:
    if isinstance(alg, str) and alg.upper() != "AES":
        raise NotImplementedError(f"DECRYPT algorithm {alg!r}: only AES")
    return F.aes_decrypt(_c(data).cast("binary"), _c(key).cast("binary"), F.lit("ECB"))


def _py_compress(data: bytes | None) -> bytes | None:
    """COMPRESS(bytes): zlib-deflate (stdlib). Container format is plain
    zlib, not the reference's LZF header — EXPAND here reverses it."""
    import zlib

    return None if data is None else zlib.compress(bytes(data))


def _py_expand(data: bytes | None) -> bytes | None:
    import zlib

    return None if data is None else zlib.decompress(bytes(data))


def _py_secure_rand(n: int | None) -> bytes | None:
    import os

    return None if n is None else os.urandom(int(n))


def _compress(data) -> Column:
    return F.udf(_py_compress, T.BinaryType())(_c(data).cast("binary"))


def _expand(data) -> Column:
    return F.udf(_py_expand, T.BinaryType())(_c(data).cast("binary"))


def _secure_rand(n) -> Column:
    u = F.udf(_py_secure_rand, T.BinaryType()).asNondeterministic()
    return u(_c(n))


def _zero() -> Column:
    return F.lit(0)


def _casewhen(cond, a, b) -> Column:
    return F.when(_c(cond), _c(a)).otherwise(_c(b))


def _nvl2(v, a, b) -> Column:
    return F.when(_c(v).isNotNull(), _c(a)).otherwise(_c(b))


def _decode(v, *pairs) -> Column:
    """DECODE(v, when1, then1[, when2, then2...][, default])."""
    vv = _c(v)
    out = None
    i = 0
    while i + 1 < len(pairs):
        cond = vv.eqNullSafe(_c(pairs[i]))
        out = F.when(cond, _c(pairs[i + 1])) if out is None else out.when(
            cond, _c(pairs[i + 1])
        )
        i += 2
    if i < len(pairs) and out is not None:
        out = out.otherwise(_c(pairs[i]))
    return out if out is not None else F.lit(None)


def _dayname(d) -> Column:
    return F.date_format(_c(d), "EEEE")


def _monthname(d) -> Column:
    return F.date_format(_c(d), "MMMM")


_DATE_UNITS = {
    "year": "year", "yyyy": "year", "yy": "year",
    "quarter": "quarter", "qq": "quarter", "q": "quarter",
    "month": "month", "mm": "month", "m": "month",
    "week": "week", "wk": "week", "ww": "week",
    "day": "day", "dd": "day", "d": "day",
    "hour": "hour", "hh": "hour",
    "minute": "minute", "mi": "minute", "n": "minute",
    "second": "second", "ss": "second", "s": "second",
    "millisecond": "millisecond", "ms": "millisecond",
}


def _dateadd(unit: str, n, ts) -> Column:
    """DATEADD/TIMESTAMPADD (unit map Function.java:140-172)."""
    u = _DATE_UNITS[unit.strip().lower()]
    nn = _c(n)
    if u == "millisecond":
        return F.timestamp_micros(
            (F.unix_micros(_c(ts)) + nn.cast("long") * 1000)
        )
    return _c(ts) + F.make_interval(**{
        "year": dict(years=nn), "quarter": dict(months=nn * 3),
        "month": dict(months=nn), "week": dict(weeks=nn),
        "day": dict(days=nn), "hour": dict(hours=nn),
        "minute": dict(mins=nn), "second": dict(secs=nn.cast("double")),
    }[u])


def _datediff(unit: str, a, b) -> Column:
    u = _DATE_UNITS[unit.strip().lower()]
    sql_unit = {"millisecond": "MILLISECOND"}.get(u, u.upper())
    return F.timestamp_diff(sql_unit, _c(a), _c(b))


def _regexp_like(s, p) -> Column:
    return _c(s).rlike(p)


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------
FUNCTIONS: dict[str, Callable[..., Column]] = {
    # --- math (Function.java:83-87,188-234) ---
    "ABS": lambda x: F.abs(_c(x)),
    "ACOS": lambda x: F.acos(_c(x)),
    "ASIN": lambda x: F.asin(_c(x)),
    "ATAN": lambda x: F.atan(_c(x)),
    "ATAN2": lambda y, x: F.atan2(_c(y), _c(x)),
    "BITAND": lambda a, b: _c(a).bitwiseAND(_c(b)),
    "BITOR": lambda a, b: _c(a).bitwiseOR(_c(b)),
    "BITXOR": lambda a, b: _c(a).bitwiseXOR(_c(b)),
    "CEILING": lambda x: F.ceil(_c(x)),
    "CEIL": lambda x: F.ceil(_c(x)),
    "COS": lambda x: F.cos(_c(x)),
    "COSH": lambda x: F.cosh(_c(x)),
    "COT": _cot,
    "DEGREES": lambda x: F.degrees(_c(x)),
    "EXP": lambda x: F.exp(_c(x)),
    "FLOOR": lambda x: F.floor(_c(x)),
    "LOG": lambda x: F.log(_c(x)),  # H2: natural log (Function.java LOG)
    "LN": lambda x: F.log(_c(x)),
    "LOG10": lambda x: F.log10(_c(x)),
    "MOD": lambda a, b: _c(a) % _c(b),
    "PI": lambda: F.lit(3.141592653589793),
    "POWER": lambda x, y: F.pow(_c(x), _c(y)),
    "RADIANS": lambda x: F.radians(_c(x)),
    "RAND": lambda seed=None: F.rand(seed) if seed is not None else F.rand(),
    "RANDOM": lambda seed=None: F.rand(seed) if seed is not None else F.rand(),
    "ROUND": lambda x, d=0: F.round(_c(x), d),
    "ROUNDMAGIC": _roundmagic,
    "SIGN": lambda x: F.signum(_c(x)),
    "SIN": lambda x: F.sin(_c(x)),
    "SINH": lambda x: F.sinh(_c(x)),
    "SQRT": lambda x: F.sqrt(_c(x)),
    "TAN": lambda x: F.tan(_c(x)),
    "TANH": lambda x: F.tanh(_c(x)),
    "TRUNCATE": _truncate,
    "TRUNC": _truncate,
    "HASH": _hash,
    "ENCRYPT": _encrypt,
    "DECRYPT": _decrypt,
    "COMPRESS": _compress,
    "EXPAND": _expand,
    "SECURE_RAND": _secure_rand,
    "ZERO": _zero,
    "RANDOM_UUID": lambda: F.expr("uuid()"),
    "SYS_GUID": lambda: F.expr("uuid()"),
    # --- string (Function.java:89-95,236-286) ---
    "ASCII": lambda s: F.ascii(_c(s)),
    "BIT_LENGTH": _bit_length,
    "CHAR": lambda n: F.chr(_c(n)),
    "CHR": lambda n: F.chr(_c(n)),
    "CHAR_LENGTH": lambda s: F.char_length(_c(s)),
    "CHARACTER_LENGTH": lambda s: F.char_length(_c(s)),
    "CONCAT": lambda *xs: F.concat(*[_c(x) for x in xs]),
    "CONCAT_WS": lambda sep, *xs: F.concat_ws(sep, *[_c(x) for x in xs]),
    "HEXTORAW": lambda s: F.unhex(_c(s)),
    "RAWTOHEX": lambda s: F.hex(_c(s)),
    "INSERT": _insert,
    "INSTR": lambda s, sub, start=None: F.instr(_c(s), sub)
    if start is None
    else F.locate(sub, _c(s), start),
    "LCASE": lambda s: F.lower(_c(s)),
    "LOWER": lambda s: F.lower(_c(s)),
    "LEFT": lambda s, n: F.expr(f"left({_sql(s)}, {int(n)})")
    if isinstance(n, int)
    else F.substring(_c(s), 1, n),
    "LENGTH": lambda s: F.length(_c(s)),
    "LOCATE": lambda sub, s, start=None: F.locate(sub, _c(s), start or 1),
    "CHARINDEX": lambda sub, s, start=None: F.locate(sub, _c(s), start or 1),
    "POSITION": lambda sub, s: F.locate(sub, _c(s)),
    "LTRIM": lambda s: F.ltrim(_c(s)),
    "OCTET_LENGTH": lambda s: F.octet_length(_c(s)),
    "REPEAT": lambda s, n: F.repeat(_c(s), n),
    "REPLACE": lambda s, a, b="": F.replace(_c(s), _c(a), _c(b)),
    "RIGHT": lambda s, n: F.expr(f"right({_sql(s)}, {int(n)})"),
    "RTRIM": lambda s: F.rtrim(_c(s)),
    "SOUNDEX": lambda s: F.soundex(_c(s)),
    "SPACE": lambda n: F.repeat(F.lit(" "), n),
    "SUBSTR": lambda s, p, l=None: F.substring(_c(s), p, l)
    if l is not None
    else _c(s).substr(_c(p), F.length(_c(s))),
    "SUBSTRING": lambda s, p, l=None: F.substring(_c(s), p, l)
    if l is not None
    else _c(s).substr(_c(p), F.length(_c(s))),
    "UCASE": lambda s: F.upper(_c(s)),
    "UPPER": lambda s: F.upper(_c(s)),
    "TRIM": lambda s: F.trim(_c(s)),
    "STRINGTOUTF8": lambda s: F.encode(_c(s), "UTF-8"),
    "UTF8TOSTRING": lambda b: F.decode(_c(b), "UTF-8"),
    "REGEXP_REPLACE": lambda s, p, r: F.regexp_replace(_c(s), p, r),
    "REGEXP_LIKE": _regexp_like,
    "RPAD": lambda s, n, p=" ": F.rpad(_c(s), n, p),
    "LPAD": lambda s, n, p=" ": F.lpad(_c(s), n, p),
    # --- date/time (Function.java:97-101,289-323) ---
    "CURRENT_DATE": lambda: F.current_date(),
    "CURDATE": lambda: F.current_date(),
    "GETDATE": lambda: F.current_date(),
    "CURRENT_TIMESTAMP": lambda: F.current_timestamp(),
    "NOW": lambda: F.current_timestamp(),
    "CURRENT_TIME": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "CURTIME": lambda: F.date_format(F.current_timestamp(), "HH:mm:ss"),
    "DATEADD": _dateadd,
    "TIMESTAMPADD": _dateadd,
    "DATEDIFF": _datediff,
    "TIMESTAMPDIFF": _datediff,
    "DAYNAME": _dayname,
    "DAY": lambda d: F.dayofmonth(_c(d)),
    "DAYOFMONTH": lambda d: F.dayofmonth(_c(d)),
    "DAY_OF_MONTH": lambda d: F.dayofmonth(_c(d)),
    "DAYOFWEEK": lambda d: F.dayofweek(_c(d)),
    "DAY_OF_WEEK": lambda d: F.dayofweek(_c(d)),
    "DAYOFYEAR": lambda d: F.dayofyear(_c(d)),
    "DAY_OF_YEAR": lambda d: F.dayofyear(_c(d)),
    "HOUR": lambda d: F.hour(_c(d)),
    "MINUTE": lambda d: F.minute(_c(d)),
    "MONTH": lambda d: F.month(_c(d)),
    "MONTHNAME": _monthname,
    "QUARTER": lambda d: F.quarter(_c(d)),
    "SECOND": lambda d: F.second(_c(d)),
    "WEEK": lambda d: F.weekofyear(_c(d)),
    "ISO_WEEK": lambda d: F.weekofyear(_c(d)),
    "ISO_YEAR": lambda d: F.expr(f"extract(yearofweek FROM {_sql(d)})"),
    "ISO_DAY_OF_WEEK": lambda d: F.expr(f"extract(dayofweek_iso FROM {_sql(d)})"),
    "YEAR": lambda d: F.year(_c(d)),
    "EXTRACT": lambda field, d: F.expr(f"extract({field} FROM {_sql(d)})"),
    "FORMATDATETIME": lambda d, fmt: F.date_format(_c(d), fmt),
    "PARSEDATETIME": lambda s, fmt: F.to_timestamp(_c(s), fmt),
    "LAST_DAY": lambda d: F.last_day(_c(d)),
    # --- conversion / conditional (Function.java:106-110,337-367) ---
    "IFNULL": lambda a, b: F.coalesce(_c(a), _c(b)),
    "ISNULL": lambda a, b: F.coalesce(_c(a), _c(b)),
    "CASEWHEN": _casewhen,
    "CONVERT": lambda x, t: _c(x).cast(t),
    "CAST": lambda x, t: _c(x).cast(t),
    "COALESCE": lambda *xs: F.coalesce(*[_c(x) for x in xs]),
    "NVL": lambda a, b: F.coalesce(_c(a), _c(b)),
    "NVL2": _nvl2,
    "NULLIF": lambda a, b: F.nullif(_c(a), _c(b)),
    "DECODE": _decode,
    "GREATEST": lambda *xs: F.greatest(*[_c(x) for x in xs]),
    "LEAST": lambda *xs: F.least(*[_c(x) for x in xs]),
    "TRUNCATE_VALUE": lambda x, p, s=None: _c(x).cast(f"decimal({p},{s or 0})"),
    # --- array (Function.java:350-359) ---
    "ARRAY_GET": lambda a, i: F.element_at(_c(a), i),  # 1-based, matches
    "ARRAY_LENGTH": lambda a: F.size(_c(a)),
    "ARRAY_CONTAINS": lambda a, v: F.array_contains(_c(a), v),
    # --- system/session (engine-shell literals; Function.java:103-104) ---
    "DATABASE": lambda: F.lit("spark"),
    "USER": lambda: F.lit("spark"),
    "CURRENT_USER": lambda: F.lit("spark"),
    "SCHEMA": lambda: F.lit("default"),
    "SESSION_ID": lambda: F.lit(0),
    "TRANSACTION_ID": lambda: F.lit(None).cast("string"),
    "AUTOCOMMIT": lambda: F.lit(True),
    "READONLY": lambda: F.lit(False),
    "LOCK_TIMEOUT": lambda: F.lit(0),
    "MEMORY_FREE": lambda: F.lit(0),
    "MEMORY_USED": lambda: F.lit(0),
    # engine version string (reference: Function.java:369 registers
    # LEALONE_VERSION returning Constants.getVersion())
    "LEALONE_VERSION": lambda: F.lit(_engine_version()),
}


def _engine_version() -> str:
    from .. import __version__

    return __version__


def _sql(x) -> str:
    """Render a column reference for F.expr-based builders: accepts a
    column NAME (string) only — Column objects can't be round-tripped to
    SQL text reliably."""
    if isinstance(x, str):
        return x
    raise TypeError(
        "this function requires a column name (string) so it can be "
        "rendered into a SQL expression"
    )


# names the reference registers that have no sensible batch equivalent;
# call() raises a clear error for them.
UNSUPPORTED: dict[str, str] = {
    "CANCEL_SESSION": "no session registry in batch engine",
    "DATABASE_PATH": "storage is a warehouse dir, not a db file",
    "DISK_SPACE_USED": "ask the filesystem, not the query engine",
    "LOCK_MODE": "no lock manager (snapshot isolation)",
    "IDENTITY": "use sequences (EngineSession.create_sequence)",
    "SCOPE_IDENTITY": "use sequences",
    "LAST_INSERT_ID": "use sequences",
    "CURRVAL": "use EngineSession.sequence(name)",
    "NEXTVAL": "use EngineSession.sequence(name).next_value()",
    # aliases of the sequence/identity trio above (same OLTP-session
    # semantics, same replacement)
    "LASTVAL": "alias of CURRVAL — use EngineSession.sequence(name)",
    "IDENTITY_VAL_LOCAL": "alias of IDENTITY — use sequences",
    # remote-database link: out of scope for a lake engine (reads from
    # another live server); use spark.read against that source instead
    "LINK_SCHEMA": "no remote-db links — spark.read the source directly",
}


def unsupported_names() -> dict[str, str]:
    return dict(UNSUPPORTED)


def call(name: str, *args) -> Column:
    """Call a reference function by name → pyspark Column."""
    key = name.upper()
    if key in UNSUPPORTED:
        raise NotImplementedError(f"{key}: {UNSUPPORTED[key]}")
    try:
        fn = FUNCTIONS[key]
    except KeyError:
        raise KeyError(
            f"unknown function {key!r}; known: {len(FUNCTIONS)} names"
        ) from None
    return fn(*args)


# ---------------------------------------------------------------------------
# true Python UDFs (slow path — none used in analytical hot paths)
# ---------------------------------------------------------------------------
def _py_difference(a: str | None, b: str | None) -> int | None:
    """DIFFERENCE: count of matching soundex positions (H2 semantics)."""
    if a is None or b is None:
        return None

    def soundex(s: str) -> str:
        s = "".join(ch for ch in s.upper() if ch.isalpha())
        if not s:
            return "0000"
        codes = {
            **dict.fromkeys("BFPV", "1"), **dict.fromkeys("CGJKQSXZ", "2"),
            **dict.fromkeys("DT", "3"), "L": "4",
            **dict.fromkeys("MN", "5"), "R": "6",
        }
        out = [s[0]]
        prev = codes.get(s[0], "")
        for ch in s[1:]:
            code = codes.get(ch, "")
            if code and code != prev:
                out.append(code)
            if ch not in "HW":
                prev = code
        return (("".join(out)) + "000")[:4]

    sa, sb = soundex(a), soundex(b)
    return sum(1 for x, y in zip(sa, sb) if x == y)


def _py_stringencode(s: str | None) -> str | None:
    """STRINGENCODE: java-style escaping (H2 StringUtils.javaEncode)."""
    if s is None:
        return None
    out = []
    for ch in s:
        if ch == "\t":
            out.append("\\t")
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\\":
            out.append("\\\\")
        elif ord(ch) < 32 or ord(ch) > 126:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def _py_stringdecode(s: str | None) -> str | None:
    if s is None:
        return None
    return s.encode("ascii", "backslashreplace").decode("unicode_escape")


def _py_xmlattr(name: str | None, value: str | None) -> str | None:
    if name is None or value is None:
        return None
    v = value.replace("&", "&amp;").replace("<", "&lt;").replace('"', "&quot;")
    return f' {name}="{v}"'


def _py_xmlnode(name: str | None, attrs: str | None, content: str | None) -> str | None:
    if name is None:
        return None
    a = attrs or ""
    if content is None:
        return f"<{name}{a}/>"
    return f"<{name}{a}>{content}</{name}>"


def _py_xmltext(s: str | None) -> str | None:
    if s is None:
        return None
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _py_xmlcomment(s: str | None) -> str | None:
    if s is None:
        return None
    return f"<!-- {s.replace('--', '- -')} -->"


def _py_xmlcdata(s: str | None) -> str | None:
    if s is None:
        return None
    return f"<![CDATA[{s}]]>" if "]]>" not in s else _py_xmltext(s)


def _py_xmlstartdoc() -> str:
    return "<?xml version=\"1.0\"?>"


def register_udfs(spark: SparkSession) -> list[str]:
    """Register the Python-implemented reference functions for SQL use.
    Returns the list of registered names."""
    regs: list[tuple[str, Callable, T.DataType]] = [
        ("DIFFERENCE", _py_difference, T.IntegerType()),
        ("STRINGENCODE", _py_stringencode, T.StringType()),
        ("STRINGDECODE", _py_stringdecode, T.StringType()),
        ("XMLATTR", _py_xmlattr, T.StringType()),
        ("XMLNODE", _py_xmlnode, T.StringType()),
        ("XMLTEXT", _py_xmltext, T.StringType()),
        ("XMLCOMMENT", _py_xmlcomment, T.StringType()),
        ("XMLCDATA", _py_xmlcdata, T.StringType()),
        ("XMLSTARTDOC", _py_xmlstartdoc, T.StringType()),
        ("COMPRESS", _py_compress, T.BinaryType()),
        ("EXPAND", _py_expand, T.BinaryType()),
    ]
    for name, fn, typ in regs:
        spark.udf.register(name, fn, typ)
    spark.udf.register(
        "SECURE_RAND",
        F.udf(_py_secure_rand, T.BinaryType()).asNondeterministic(),
    )
    return [r[0] for r in regs] + ["SECURE_RAND"]
