"""Engine catalog + SQL statement router (SURVEY.md §2.9, §3).

The reference executes ~50 DDL statement types plus INSERT/UPDATE/DELETE/
MERGE through its parser (lealone-sql/.../ddl/, dml/); this module is the
Spark-native statement surface: a :class:`Catalog` of snapshot-versioned
parquet tables plus a router that turns statement text into DataFrame
operations. SELECT text goes through the dialect rewriter to Spark SQL.

Supported statements (reference file cites):
- CREATE TABLE / DROP TABLE / TRUNCATE TABLE (CreateTable.java,
  DropTable.java, TruncateTable.java)
- INSERT VALUES / INSERT SELECT (Insert.java:33,127)
- UPDATE ... SET ... [WHERE] (Update.java:125-200)
- DELETE FROM ... [WHERE] (Delete.java:84-130)
- MERGE INTO t [(cols)] KEY(cols) VALUES ... / SELECT (Merge.java:35)
- CREATE [OR REPLACE] VIEW / DROP VIEW (CreateView.java)
- CREATE INDEX / DROP INDEX — metadata-only (CreateIndex.java; an LSM/
  BTree index has no meaning over parquet + Catalyst, recorded for
  introspection)
- CREATE SEQUENCE / DROP SEQUENCE (CreateSequence.java)
- EXPLAIN <query> (Explain.java:30)
- SET name value (dml/Set.java)
- CALL <expr> (Call.java:23)
- SCRIPT (dump DDL; Script.java) — returns the DDL as rows

Everything here is driver-side metadata + Spark jobs; no OLTP machinery.
"""

from __future__ import annotations

import copy
import os
import re
from dataclasses import dataclass, field
from typing import TYPE_CHECKING, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .operators.dml import SnapshotTable, merge_by_key
from .services import ServiceMeta, generate_model_code, generate_service_code, parse_methods

if TYPE_CHECKING:
    from .session import EngineSession

# H2/reference type name → Spark SQL type (SURVEY.md §1.2 mapping table)
TYPE_MAP = {
    "int": "int", "integer": "int", "mediumint": "int", "int4": "int",
    "signed": "int",
    "long": "bigint", "bigint": "bigint", "int8": "bigint",
    "identity": "bigint", "serial": "bigint",
    "tinyint": "tinyint", "smallint": "smallint", "int2": "smallint",
    "year": "smallint",
    "double": "double", "float": "double", "float8": "double",
    "real": "float", "float4": "float",
    "decimal": "decimal(18,2)", "numeric": "decimal(18,2)", "dec": "decimal(18,2)",
    "number": "decimal(18,2)",
    "boolean": "boolean", "bool": "boolean", "bit": "boolean",
    "varchar": "string", "char": "string", "character": "string",
    "varchar2": "string", "nvarchar": "string", "nvarchar2": "string",
    "varchar_casesensitive": "string",
    # reference STRING_IGNORECASE (Value.java:118): case-insensitive at
    # every compare site — Spark 4 native collation gives exactly that,
    # JVM-side (no lower() wrappers needed)
    "varchar_ignorecase": "string collate UTF8_LCASE",
    "longvarchar": "string", "clob": "string", "text": "string",
    "ntext": "string", "nclob": "string", "string": "string",
    "uuid": "string",
    "binary": "binary", "varbinary": "binary", "blob": "binary",
    "bytea": "binary", "raw": "binary", "longvarbinary": "binary",
    "other": "binary",
    "date": "date", "time": "string",  # no Spark TimeType → 'HH:mm:ss' strings
    "timestamp": "timestamp", "datetime": "timestamp", "smalldatetime": "timestamp",
    "array": "array<string>",
}

_IDENT = r"[A-Za-z_][A-Za-z0-9_]*"


def _sql_literal(v) -> str:
    """Python value → SQL literal for SCRIPT dumps (reference Script.java
    delegates to each Value type's getSQL())."""
    import datetime as _dt
    from decimal import Decimal as _Dec

    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float, _Dec)):
        return str(v)
    if isinstance(v, _dt.datetime):
        return f"TIMESTAMP '{v.strftime('%Y-%m-%d %H:%M:%S.%f')}'"
    if isinstance(v, _dt.date):
        return f"DATE '{v.isoformat()}'"
    if isinstance(v, (bytes, bytearray)):
        return f"X'{bytes(v).hex()}'"
    if isinstance(v, (list, tuple)):
        return "ARRAY[" + ", ".join(_sql_literal(x) for x in v) + "]"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def _import_dotted(path: str):
    """Resolve ``module.sub.attr`` to the attribute (CREATE ALIAS /
    CREATE AGGREGATE ``FOR`` targets — the reference resolves Java
    class/method names the same way, CreateFunctionAlias.java:71)."""
    import importlib

    mod_name, _, attr = path.rpartition(".")
    if not mod_name:
        raise ValueError(f"not a dotted path: {path}")
    try:
        mod = importlib.import_module(mod_name)
    except ImportError as exc:
        raise ValueError(f"cannot import {mod_name}: {exc}") from exc
    try:
        return getattr(mod, attr)
    except AttributeError as exc:
        raise ValueError(f"{mod_name} has no attribute {attr}") from exc


@dataclass
class IndexMeta:
    name: str
    table: str
    columns: list[str]
    unique: bool = False


@dataclass
class TableConstraints:
    """Column semantics beyond the storage schema (reference Column.java:
    70-81 — defaults, computed columns, CHECK, NOT NULL; enforcement at
    write time, since parquet itself enforces nothing)."""

    not_null: list[str] = field(default_factory=list)
    defaults: dict[str, str] = field(default_factory=dict)  # col → SQL expr
    computed: dict[str, str] = field(default_factory=dict)  # col → SQL expr
    checks: list[str] = field(default_factory=list)  # SQL boolean exprs
    identity: list[str] = field(default_factory=list)  # auto-fill columns
    # FOREIGN KEY metadata (ConstraintReferential.java): recorded, not
    # enforced — (fk_name, fk_columns, ref_table, ref_columns)
    foreign_keys: list[tuple[str, list[str], str, list[str]]] = field(
        default_factory=list
    )


@dataclass
class Catalog:
    """Schema-object registry: tables (snapshot-backed), views, indexes,
    sequences metadata (sequences themselves live on EngineSession)."""

    spark: SparkSession
    warehouse: str
    tables: dict[str, SnapshotTable] = field(default_factory=dict)
    table_ddl: dict[str, str] = field(default_factory=dict)
    views: dict[str, str] = field(default_factory=dict)
    indexes: dict[str, IndexMeta] = field(default_factory=dict)
    domains: dict[str, str] = field(default_factory=dict)
    principals: set[str] = field(default_factory=set)
    constraints: dict[str, TableConstraints] = field(default_factory=dict)
    # schema-level objects (reference: Schema.java / CreateSchema.java,
    # CreateConstant.java, CreateRole.java, GrantRevoke.java, Comment-
    # Statement) — a flat namespace registry; table names stay unqualified
    # like the reference's default PUBLIC-schema usage
    schemas: dict[str, str] = field(default_factory=lambda: {"public": "sa"})
    constants: dict[str, str] = field(default_factory=dict)  # name → SQL expr
    roles: set[str] = field(default_factory=lambda: {"public"})
    # (grantee, rights, object) from GRANT/REVOKE
    grants: list[tuple[str, str, str]] = field(default_factory=list)
    comments: dict[str, str] = field(default_factory=dict)  # object → remark
    triggers: dict[str, str] = field(default_factory=dict)  # name → DDL text
    # CREATE SERVICE registry (services.py; Parser.java:4252)
    services: dict[str, "ServiceMeta"] = field(default_factory=dict)
    # materialized views: name → defining query (extension; the stored
    # result lives in ``tables`` as a snapshot table)
    mat_views: dict[str, str] = field(default_factory=dict)
    # incremental-refresh state: mv name → (base table, base version the
    # stored result reflects) — set when the MV's base is a catalog
    # snapshot table, advanced by every refresh
    mv_base: dict[str, tuple[str, int]] = field(default_factory=dict)

    def table(self, name: str) -> SnapshotTable:
        key = name.lower()
        if key not in self.tables:
            raise KeyError(f"table not found: {name}")
        return self.tables[key]

    def refresh_view(self, name: str) -> None:
        """Re-register the temp view over the table's CURRENT snapshot so
        subsequent SELECTs observe the mutation. Dependent SQL views are
        re-resolved too (a Spark temp view freezes its plan at creation,
        so stored definitions must be replayed in creation order)."""
        key = name.lower()
        self.tables[key].read().createOrReplaceTempView(key)
        for vname, vquery in self.views.items():
            self.spark.sql(vquery).createOrReplaceTempView(vname)


def _parse_codegen_extras(extras: str) -> tuple[str, str]:
    """(package, code_path) from the trailing PACKAGE / GENERATE CODE
    clauses (empty strings when absent)."""
    pkg = re.search(r"PACKAGE\s+'([^']*)'", extras, re.IGNORECASE)
    path = re.search(r"GENERATE\s+CODE\s+'([^']*)'", extras, re.IGNORECASE)
    return (pkg.group(1) if pkg else "", path.group(1) if path else "")


# Named-collation mapping (reference: lealone-common/.../db/value/
# CompareMode.java + CompareModeIcu4J.java; dml/Set.java COLLATION).
# Language names map to ICU locales; STRENGTH PRIMARY ignores
# case+accents (_CI_AI), SECONDARY ignores case (_CI), TERTIARY /
# IDENTICAL keep full sensitivity. Used by both SET COLLATION
# (database-level, applies to new tables) and per-column
# ``COLLATE <name>`` in CREATE TABLE DDL.
_COLLATION_LOCALES = {
    "ENGLISH": "en", "FRENCH": "fr", "GERMAN": "de", "SPANISH": "es",
    "ITALIAN": "it", "PORTUGUESE": "pt", "CHINESE": "zh",
    "JAPANESE": "ja", "KOREAN": "ko", "RUSSIAN": "ru", "DUTCH": "nl",
    "SWEDISH": "sv", "NORWEGIAN": "no", "DANISH": "da",
    "FINNISH": "fi", "POLISH": "pl", "TURKISH": "tr",
}


# ISO 3166 alpha-2 -> alpha-3 for the country part of ICU locale ids:
# the reference (CompareModeIcu4J.java) accepts `de_AT`-style ids, but
# Spark 4 collation names use alpha-3 (`de_AUT`). Script subtags (4
# letters: Hant, Cyrl, Latn) pass through untouched. Countries not
# listed pass through and get Spark's typed validation at DDL time.
_COUNTRY_A2_TO_A3 = {
    "AT": "AUT", "AU": "AUS", "BE": "BEL", "BR": "BRA", "CA": "CAN",
    "CH": "CHE", "CN": "CHN", "CZ": "CZE", "DE": "DEU", "DK": "DNK",
    "ES": "ESP", "FI": "FIN", "FR": "FRA", "GB": "GBR", "GR": "GRC",
    "HK": "HKG", "IE": "IRL", "IN": "IND", "IT": "ITA", "JP": "JPN",
    "KR": "KOR", "MX": "MEX", "NL": "NLD", "NO": "NOR", "NZ": "NZL",
    "PL": "POL", "PT": "PRT", "RS": "SRB", "RU": "RUS", "SE": "SWE",
    "SG": "SGP", "TR": "TUR", "TW": "TWN", "UA": "UKR", "US": "USA",
}


def collation_to_spark(name: str, strength: str | None = None) -> str | None:
    """H2/ICU collation name [+ strength] → Spark 4 collation identifier
    (None = UTF8_BINARY, the default). Unknown language names pass
    through lowercased as ICU locale ids — `de_AT`-style country
    variants are rewritten to Spark's alpha-3 form (`de_AUT`), script
    subtags (`zh_Hant`) pass through — and Spark validates the result at
    the compare/DDL site; the caller converts that to a typed error."""
    up = name.upper()
    if up in ("OFF", "BINARY"):
        return None  # UTF8_BINARY, the default
    if up.startswith("ICU4J_"):
        up = up[len("ICU4J_"):]
    base = _COLLATION_LOCALES.get(up)
    if base is None:
        # fall back on the PREFIX-STRIPPED name: ICU4J_EN must map to
        # locale 'en', not 'icu4j_en' (r6 review finding)
        if up in ("DEFAULT", "UNICODE"):
            base = "UNICODE"
        else:
            parts = up.split("_")
            out = [parts[0].lower()]
            for p in parts[1:]:
                if len(p) == 4 and p.isalpha():
                    out.append(p.title())  # script subtag: Hant, Cyrl
                elif len(p) == 2 and p.upper() in _COUNTRY_A2_TO_A3:
                    out.append(_COUNTRY_A2_TO_A3[p.upper()])
                else:
                    out.append(p.upper() if p.isalpha() else p)
            base = "_".join(out)
    suffix = {
        "PRIMARY": "_CI_AI",
        "SECONDARY": "_CI",
        "TERTIARY": "",
        "IDENTICAL": "",
    }.get((strength or "").upper(), "")
    return f"{base}{suffix}"


def _balanced_group(s: str, open_idx: int) -> str | None:
    """Content of the quote-aware balanced parenthesized group whose
    '(' sits at ``s[open_idx]`` — the extraction CHECK/DEFAULT need,
    since a ``[^)]*`` regex truncates at the first ')' of any nested
    call like COALESCE(x, 0). None if unbalanced."""
    depth, i, in_q = 0, open_idx, False
    while i < len(s):
        c = s[i]
        if c == "'":
            in_q = not in_q
        elif not in_q:
            if c == "(":
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    return s[open_idx + 1 : i]
        i += 1
    return None


def _parse_columns(cols_sql: str) -> tuple[str, list[str], "TableConstraints"]:
    """'(a int primary key, b varchar(10) not null default 5, ...)' →
    (spark schema DDL, primary-key column list, constraints).

    The top-level splitter tracks string literals as well as paren
    depth: a comma inside a quoted DEFAULT/CHECK literal (``DEFAULT
    'a,b'``) is literal content, not a column separator."""
    parts: list[str] = []
    depth = 0
    in_quote = False
    cur = []
    for ch in cols_sql:
        if ch == "'":
            in_quote = not in_quote
            cur.append(ch)
        elif in_quote:
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur).strip())

    fields, pks = [], []
    cons = TableConstraints()
    for p in parts:
        is_constraint = re.match(
            r"(CONSTRAINT|FOREIGN|UNIQUE|KEY|PRIMARY|CHECK)\b",
            p.strip(),
            re.IGNORECASE,
        )
        m = None if is_constraint else re.match(
            rf"({_IDENT})\s+({_IDENT})(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?(?P<rest>.*)$",
            p.strip(),
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            # table-level PRIMARY KEY (...) constraint
            pk = re.match(
                r"PRIMARY\s+KEY\s*\(([^)]*)\)", p.strip(), re.IGNORECASE
            )
            if pk:
                pks.extend(c.strip().lower() for c in pk.group(1).split(","))
                continue
            chk = re.match(r"CHECK\s*\((.*)\)\s*$", p.strip(), re.IGNORECASE | re.DOTALL)
            if chk:
                cons.checks.append(chk.group(1))
                continue
            fk = re.match(
                rf"(?:CONSTRAINT\s+(?P<fkname>{_IDENT})\s+)?FOREIGN\s+KEY\s*"
                rf"\((?P<cols>[^)]*)\)\s*REFERENCES\s+(?P<ref>{_IDENT})"
                rf"\s*(?:\((?P<refcols>[^)]*)\))?",
                p.strip(),
                re.IGNORECASE,
            )
            if fk:
                cons.foreign_keys.append(
                    (
                        (fk.group("fkname") or "").lower(),
                        [c.strip().lower() for c in fk.group("cols").split(",")],
                        fk.group("ref").lower(),
                        [
                            c.strip().lower()
                            for c in (fk.group("refcols") or "").split(",")
                            if c.strip()
                        ],
                    )
                )
                continue
            if re.match(r"(CONSTRAINT|FOREIGN|UNIQUE|KEY)\b", p.strip(), re.IGNORECASE):
                continue  # unique-constraint syntax: metadata-only
            raise ValueError(f"cannot parse column definition: {p!r}")
        name, typ = m.group(1), m.group(2).lower()
        lname = name.lower()
        args = (m.group(3) or "").strip()
        rest = m.group("rest") or ""
        if typ in ("decimal", "numeric", "dec", "number") and args:
            spark_type = f"decimal{args}"
        else:
            spark_type = TYPE_MAP.get(typ, "string")
        # per-column named collation: ``w VARCHAR(20) COLLATE GERMAN
        # [STRENGTH SECONDARY]`` → ``w string collate de_CI`` (Spark 4
        # native collation — ordering and equality are then JVM-side at
        # every compare site; reference CompareMode.java semantics).
        # Keyword clauses are recognized on STRIPPED text so tokens
        # inside a DEFAULT string literal ('COLLATE GERMAN', 'NOT
        # NULL', 'PRIMARY KEY', …) or a CHECK expression can never be
        # misparsed as clauses of the column (r6 advice finding + the
        # follow-up review: the whole keyword family had the bug, not
        # just COLLATE) — while real clauses anywhere in the definition
        # (e.g. COLLATE after NOT NULL) are still honored.
        # ``masked`` blanks literal CONTENT but preserves every position,
        # so a clause found in masked can slice its expression out of
        # the raw text; ``bare`` additionally drops parenthesized groups
        # for pure presence checks.
        masked = re.sub(
            r"'(?:[^']|'')*'",
            lambda mm: "'" + "x" * (len(mm.group(0)) - 2) + "'",
            rest,
        )
        bare = masked
        while True:
            stripped = re.sub(r"\([^()]*\)", "", bare)
            if stripped == bare:
                break
            bare = stripped
        cm = re.search(
            rf"\bCOLLATE\s+(?P<cname>{_IDENT})(?:\s+STRENGTH\s+(?P<cstr>\w+))?",
            bare,
            re.IGNORECASE,
        )
        if cm and spark_type == "string":
            sc = collation_to_spark(cm.group("cname"), cm.group("cstr"))
            if sc is not None:
                spark_type = f"string collate {sc}"
        fields.append(f"{name} {spark_type}")
        if typ in ("identity", "serial") or re.search(
            r"AUTO_INCREMENT|IDENTITY", bare, re.IGNORECASE
        ):
            cons.identity.append(lname)
        if re.search(r"PRIMARY\s+KEY", bare, re.IGNORECASE):
            pks.append(lname)
            cons.not_null.append(lname)
        if re.search(r"NOT\s+NULL", bare, re.IGNORECASE):
            if lname not in cons.not_null:
                cons.not_null.append(lname)
        # DEFAULT / CHECK expressions: locate the clause on the masked
        # text (so literal content can't fake a keyword), then extract
        # the payload from the RAW text with quote-aware balanced-paren
        # scanning — a [^)]* regex truncates nested calls like
        # COALESCE(x, 0) at the first ')' (3rd-pass review finding).
        dm = re.search(r"\bDEFAULT\s+", masked, re.IGNORECASE)
        if dm:
            pos = dm.end()
            if pos < len(rest) and rest[pos] == "(":
                grp = _balanced_group(rest, pos)
                if grp is not None:
                    cons.defaults[lname] = f"({grp})"
            elif pos < len(rest) and rest[pos] == "'":
                lit = re.match(r"'(?:[^']|'')*'", rest[pos:])
                if lit:
                    cons.defaults[lname] = lit.group(0)
            else:
                # Bare token — but an unparenthesized FUNCTION default
                # (``DEFAULT COALESCE(a, 0)``) must extend through the
                # balanced call group: \S+ alone stops at the first
                # whitespace, storing ``COALESCE(a,`` (r7 advisor
                # finding — the '(' branch above only engages when the
                # payload STARTS with '(').
                tok = re.match(r"[A-Za-z_][\w.$]*", rest[pos:]) or re.match(
                    r"\S+", rest[pos:]
                )
                if tok:
                    val = tok.group(0)
                    after = pos + len(val)
                    if after < len(rest) and rest[after] == "(":
                        grp = _balanced_group(rest, after)
                        if grp is not None:
                            val = f"{val}({grp})"
                    cons.defaults[lname] = val
        cm = re.search(
            r"\bAS\s*\((?P<expr>.*)\)\s*$", masked, re.IGNORECASE | re.DOTALL
        )
        if cm:
            cons.computed[lname] = rest[cm.start("expr") : cm.end("expr")]
        km = re.search(r"\bCHECK\s*\(", masked, re.IGNORECASE)
        if km:
            grp = _balanced_group(rest, km.end() - 1)
            if grp is not None:
                cons.checks.append(grp)
    return ", ".join(fields), pks, cons


class StatementRouter:
    """Routes a SQL statement to catalog DDL, snapshot DML, or Spark SQL."""

    def __init__(self, session: "EngineSession", catalog: Catalog):
        self.session = session
        self.catalog = catalog
        self.spark = session.spark

    # -- entry ----------------------------------------------------------
    def execute(self, sql: str) -> DataFrame:
        s = sql.strip().rstrip(";").strip()
        head = s.split(None, 1)[0].upper() if s else ""
        handler = {
            "CREATE": self._create,
            "DROP": self._drop,
            "INSERT": self._insert,
            "UPDATE": self._update,
            "DELETE": self._delete,
            "MERGE": self._merge,
            "TRUNCATE": self._truncate,
            "EXPLAIN": self._explain,
            "SET": self._set,
            "CALL": self._call,
            "SCRIPT": self._script,
            "ANALYZE": self._analyze,
            "ALTER": self._alter,
            "RUNSCRIPT": self._runscript,
            "PREPARE": self._prepare,
            "EXECUTE": self._execute_prepared,
            "DEALLOCATE": self._deallocate,
            "GRANT": self._grant_revoke,
            "REVOKE": self._grant_revoke,
            "COMMENT": self._comment,
            "BACKUP": self._backup,
            "SHOW": self._show,
            "DESCRIBE": self._describe,
            "DESC": self._describe,
            "OPTIMIZE": self._optimize,
            "RESTORE": self._restore,
            "VACUUM": self._vacuum,
            "REFRESH": self._refresh,
            "CHECKSUM": self._checksum,
            "USE": self._use,
            "SHUTDOWN": self._shutdown,
            # DECLARE GLOBAL TEMPORARY TABLE … is CREATE in the reference
            # grammar (Parser.java:367-369)
            "DECLARE": lambda stmt: self._create(
                "CREATE " + stmt.split(None, 1)[1]
            ),
        }.get(head)
        if handler:
            result = handler(s)
            if head in (
                "CREATE", "DECLARE", "DROP", "INSERT", "UPDATE", "DELETE",
                "MERGE", "TRUNCATE", "ALTER", "RUNSCRIPT",
            ):
                self.session.invalidate_cache()
            return result
        # SELECT / WITH / VALUES / FROM-first → dialect → Spark SQL
        from .dialect import rewrite

        s = self._rewrite_info_schema(s)
        s = self._rewrite_time_travel(s)
        s = self._rewrite_table_diff(s)
        return self.spark.sql(rewrite(s, session=self.session))

    def _rewrite_time_travel(self, s: str) -> str:
        """``FROM t VERSION AS OF n`` / ``FROM t TIMESTAMP AS OF 'ts'``
        — AS-OF reads over snapshot tables.

        Each pinned version registers a dedicated temp view over
        ``SnapshotTable.read(version=n)`` (a self-contained parquet dir,
        so the historical scan costs the same as a current one) and the
        reference is rewritten to it. TIMESTAMP AS OF resolves to the
        latest version committed at or before the literal (Delta's
        resolution rule; commit time = the _SUCCESS marker's mtime, see
        SnapshotTable.commit_ts) and then shares the VERSION AS OF view
        machinery. Naive literals are interpreted as UTC. Unknown
        tables/versions/too-early timestamps raise via the lookups.
        """
        pat_ts = re.compile(
            r"\b([A-Za-z_][A-Za-z0-9_]*)\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'",
            re.IGNORECASE,
        )

        def sub_ts(m: "re.Match[str]") -> str:
            from datetime import datetime, timezone

            name, lit = m.group(1).lower(), m.group(2)
            dt = datetime.fromisoformat(lit)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            st = self.catalog.table(name)
            ver = st.version_as_of_timestamp(dt.timestamp())
            view = f"{name}__asof_{ver}"
            st.read(version=ver).createOrReplaceTempView(view)
            return view

        s = pat_ts.sub(sub_ts, s)
        pat = re.compile(
            r"\b([A-Za-z_][A-Za-z0-9_]*)\s+VERSION\s+AS\s+OF\s+(\d+)",
            re.IGNORECASE,
        )

        def sub(m: "re.Match[str]") -> str:
            name, ver = m.group(1).lower(), int(m.group(2))
            view = f"{name}__asof_{ver}"
            self.catalog.table(name).read(version=ver).createOrReplaceTempView(
                view
            )
            return view

        return pat.sub(sub, s)

    def _rewrite_table_diff(self, s: str) -> str:
        """``FROM DIFF(t, v1, v2)`` — CDC read between two retained
        snapshot versions (operators/dml.py:snapshot_diff): rewritten to
        a temp view of the classified change rows (columns of ``t`` +
        ``change_type`` in insert/delete/update)."""
        pat = re.compile(
            rf"\bDIFF\s*\(\s*(?P<name>{_IDENT})\s*,\s*(?P<v1>\d+)\s*,"
            r"\s*(?P<v2>\d+)\s*\)",
            re.IGNORECASE,
        )

        def sub(m: "re.Match[str]") -> str:
            from .operators.dml import snapshot_diff

            name = m.group("name").lower()
            v1, v2 = int(m.group("v1")), int(m.group("v2"))
            st = self.catalog.table(name)
            pk = self._pk_of(name)
            if not pk:
                raise ValueError(f"DIFF requires a primary key on {name}")
            view = f"{name}__diff_{v1}_{v2}"
            snapshot_diff(st.read(v1), st.read(v2), pk).createOrReplaceTempView(
                view
            )
            return view

        return pat.sub(sub, s)

    def _rewrite_info_schema(self, s: str) -> str:
        """Support the reference's dotted ``INFORMATION_SCHEMA.X`` table
        references (MetaTable.java:68): (re)build the meta views from the
        current catalog state, then rewrite to the registered flat
        ``information_schema_x`` temp-view names."""
        if not re.search(r"\bINFORMATION_SCHEMA\s*\.", s, re.IGNORECASE):
            return s
        from .sources.info_schema import information_schema

        information_schema(self.session)
        return re.sub(
            r"\bINFORMATION_SCHEMA\s*\.\s*([A-Za-z_][A-Za-z0-9_]*)",
            lambda m: "information_schema_" + m.group(1).lower(),
            s,
            flags=re.IGNORECASE,
        )

    def _restore(self, s: str) -> DataFrame:
        """``RESTORE TABLE t TO VERSION AS OF n`` — roll back by
        committing a link-clone of the target version
        (SnapshotTable.restore; metadata-only, history-preserving)."""
        m = re.match(
            rf"RESTORE\s+TABLE\s+(?P<name>{_IDENT})\s+TO\s+VERSION\s+AS\s+OF"
            r"\s+(?P<v>\d+)\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse RESTORE: {s[:80]}")
        name = m.group("name").lower()
        t = self.catalog.table(name)
        new_v = t.restore(int(m.group("v")))
        self.catalog.refresh_view(name)
        self.session.invalidate_cache()
        return self._ok(
            f"restored {name} to version "
            f"{int(m.group('v'))} as v{new_v}"
        )

    def _describe(self, s: str) -> DataFrame:
        """``DESCRIBE HISTORY t`` — introspect the snapshot-version chain
        (the lakehouse twin of the reference's MVCC version metadata;
        extension: the reference keeps versions in-memory per
        transaction, this engine keeps them as readable directories).
        Returns one row per COMMITTED version: version, n_files (logical
        reader tasks — links count, exactly like compact()'s threshold
        input), size_bytes (resolved physical bytes; files shared with
        older versions via links are attributed to every version that
        references them), is_current. Metadata-only: no table scan.

        Plain ``DESCRIBE t`` / ``DESC t`` routes to the SHOW COLUMNS
        surface (MySQL-compat, like the reference's parseShow)."""
        m = re.match(
            rf"DESC(?:RIBE)?\s+HISTORY\s+(?P<name>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            from datetime import datetime, timezone

            t = self.catalog.table(m.group("name").lower())
            cur = t.version
            rows = []
            for v in t.versions():
                fm = t._file_map(v)
                size = 0
                for resolved in fm:
                    try:
                        size += os.path.getsize(resolved)
                    except OSError:
                        pass
                cts = datetime.fromtimestamp(
                    t.commit_ts(v), tz=timezone.utc
                ).replace(tzinfo=None)
                rows.append((v, len(fm), size, cts, v == cur))
            return self.spark.createDataFrame(
                rows,
                "version int, n_files int, size_bytes bigint, "
                "commit_ts timestamp_ntz, is_current boolean",
            )
        m = re.match(
            rf"DESC(?:RIBE)?\s+(?:TABLE\s+)?(?P<name>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse DESCRIBE: {s[:80]}")
        name = m.group("name").lower()
        if name not in self.catalog.tables and name not in self.catalog.views:
            # Not a catalog object — a Spark-native temp view (or an
            # error Spark will phrase better than we can): fall through.
            return self.spark.sql(s)
        return self._show(f"SHOW COLUMNS FROM {name}")

    def _show(self, s: str) -> DataFrame:
        """SHOW … — rewritten to INFORMATION_SCHEMA selects exactly like
        the reference (Parser.java:884 parseShow: MySQL/PostgreSQL
        compatibility surface)."""
        m = re.match(
            r"SHOW\s+(?P<what>DATABASES|SCHEMAS|TABLES|COLUMNS"
            r"|CLIENT_ENCODING|DEFAULT_TRANSACTION_ISOLATION"
            r"|TRANSACTION\s+ISOLATION\s+LEVEL|DATESTYLE"
            r"|SERVER_VERSION|SERVER_ENCODING)"
            rf"(?:\s+FROM\s+(?P<obj>{_IDENT}))?"
            rf"(?:\s+FROM\s+(?P<schema>{_IDENT}))?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse SHOW: {s[:80]}")
        what = re.sub(r"\s+", " ", m.group("what").upper())
        pg_constants = {
            "CLIENT_ENCODING": ("'UNICODE'", "client_encoding"),
            "DEFAULT_TRANSACTION_ISOLATION": (
                "'read committed'", "default_transaction_isolation"),
            "TRANSACTION ISOLATION LEVEL": (
                "'read committed'", "transaction_isolation"),
            "DATESTYLE": ("'ISO'", "datestyle"),
            "SERVER_VERSION": ("'8.1.4'", "server_version"),
            "SERVER_ENCODING": ("'UTF8'", "server_encoding"),
        }
        if what in pg_constants:
            val, alias = pg_constants[what]
            return self.spark.sql(f"SELECT {val} AS {alias}")
        if what == "DATABASES":
            q = "SELECT database_name FROM INFORMATION_SCHEMA.DATABASES"
        elif what == "SCHEMAS":
            q = ("SELECT schema_name FROM INFORMATION_SCHEMA.SCHEMATA "
                 "ORDER BY schema_name")
        elif what == "TABLES":
            q = ("SELECT table_name, 'public' AS table_schema FROM "
                 "INFORMATION_SCHEMA.TABLES ORDER BY table_name")
        else:  # COLUMNS FROM t
            table = m.group("obj")
            if not table:
                raise ValueError("SHOW COLUMNS requires FROM <table>")
            q = (
                "SELECT column_name AS field, data_type AS type, "
                "CASE WHEN is_nullable THEN 'YES' ELSE 'NO' END AS `null` "
                f"FROM INFORMATION_SCHEMA.COLUMNS WHERE table_name = "
                f"'{table.lower()}' ORDER BY ordinal_position"
            )
        return self.spark.sql(self._rewrite_info_schema(q))

    def _ok(self, msg: str = "ok") -> DataFrame:
        return self.spark.createDataFrame([(msg,)], "status string")

    # -- DDL -------------------------------------------------------------
    def _create(self, s: str) -> DataFrame:
        # CREATE TABLE t2 [SHALLOW] CLONE t1 — zero-copy table clone
        # (extension; Delta shallow-clone semantics over the snapshot
        # layout). Metadata-only: SnapshotTable.clone_from link-clones
        # the source's current snapshot; schema/constraints/PK metadata
        # are copied; VACUUM on the source protects clone-referenced
        # versions (see _vacuum's cross-table scan).
        m = re.match(
            rf"CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})\s+"
            rf"(?:SHALLOW\s+)?CLONE\s+(?P<src>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            name, src_name = m.group("name").lower(), m.group("src").lower()
            if name in self.catalog.tables:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"table already exists: {name}")
            src = self.catalog.table(src_name)
            st = SnapshotTable(
                self.spark, self.catalog.warehouse, name,
                partition_by=src.partition_by,
            )
            st.clone_from(src)
            self.catalog.tables[name] = st
            self.catalog.table_ddl[name] = s
            # Deep-copy: ALTER TABLE mutates TableConstraints in place
            # (setdefault returns the live object), so sharing the
            # source's instance would let a later ALTER on either table
            # silently rewrite the other's write-time enforcement.
            self.catalog.constraints[name] = copy.deepcopy(
                self.catalog.constraints.get(src_name, TableConstraints())
            )
            src_pk = self.catalog.indexes.get(f"__pk_{src_name}")
            if src_pk:
                self.catalog.indexes[f"__pk_{name}"] = IndexMeta(
                    f"__pk_{name}", name, src_pk.columns, unique=True
                )
            self.catalog.refresh_view(name)
            return self._ok(f"created table {name} as clone of {src_name}")

        # trailing clauses shared by CREATE TABLE / CREATE SERVICE
        # (Parser.java:4271-4293: ENGINE, PACKAGE, IMPLEMENT BY,
        # GENERATE CODE, HIDDEN)
        _EXTRAS = (
            r"(?P<extras>(?:\s*(?:PACKAGE\s+'[^']*'|IMPLEMENT\s+BY\s+'[^']*'"
            r"|GENERATE\s+CODE\s+'[^']*'|ENGINE\s*=?\s*\w+|HIDDEN))*)"
        )
        m = re.match(
            rf"CREATE\s+(?:CACHED\s+|MEMORY\s+|(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+)?TABLE\s+"
            rf"(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})\s*\((?P<cols>.*)\){_EXTRAS}\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            name = m.group("name").lower()
            if name in self.catalog.tables:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"table already exists: {name}")
            schema_ddl, pks, cons = _parse_columns(m.group("cols"))
            if self.session.collation:
                # database collation (SET COLLATION) applies to every
                # un-collated string column of newly created tables
                schema_ddl = re.sub(
                    r"\bstring\b(?!\s+collate)",
                    f"string collate {self.session.collation}",
                    schema_ddl,
                )
            st = SnapshotTable(self.spark, self.catalog.warehouse, name)
            try:
                empty = self.spark.createDataFrame([], schema_ddl)
            except Exception as exc:
                # unknown ICU locale in a per-column COLLATE fails here;
                # reject typed like SET COLLATION does (DbException
                # INVALID_VALUE in the reference)
                if "collat" in str(exc).lower():
                    raise ValueError(
                        f"unknown collation in column DDL: {exc}"
                    ) from exc
                raise
            st.create(empty)
            self.catalog.tables[name] = st
            self.catalog.table_ddl[name] = s
            self.catalog.constraints[name] = cons
            if pks:
                self.catalog.indexes[f"__pk_{name}"] = IndexMeta(
                    f"__pk_{name}", name, pks, unique=True
                )
            self.catalog.refresh_view(name)
            pkg, code_path = _parse_codegen_extras(m.group("extras") or "")
            if code_path:
                # GENERATE CODE (SqlScript.java:56-58): emit the typed
                # Python model class for this table
                cols_typed = [
                    (f.name, f.dataType.simpleString())
                    for f in empty.schema.fields
                ]
                generate_model_code(name, cols_typed, pkg, code_path)
            return self._ok(f"created table {name}")

        m = re.match(
            rf"CREATE\s+SERVICE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
            rf"\s*(?:\((?P<methods>.*)\))?{_EXTRAS}\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # CREATE SERVICE (Parser.java:4252; services.py)
            name = m.group("name").lower()
            if name in self.catalog.services:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"service already exists: {name}")
            extras = m.group("extras") or ""
            pkg, code_path = _parse_codegen_extras(extras)
            impl = re.search(
                r"IMPLEMENT\s+BY\s+'([^']*)'", extras, re.IGNORECASE
            )
            meta = ServiceMeta(
                name=name,
                methods=parse_methods(m.group("methods") or ""),
                package=pkg,
                implement_by=impl.group(1) if impl else "",
                code_path=code_path,
                ddl=s,
            )
            self.catalog.services[name] = meta
            if code_path:
                generate_service_code(meta)
            return self._ok(f"created service {name}")

        m = re.match(
            rf"CREATE\s+(?:CACHED\s+|MEMORY\s+|(?:GLOBAL\s+|LOCAL\s+)?TEMP(?:ORARY)?\s+)?TABLE\s+"
            rf"(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
            rf"\s*(?:\((?P<cols>[^()]*)\)\s*)?AS\s+(?P<query>(?:SELECT|WITH|VALUES|FROM)\b.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # CREATE TABLE … AS query (CTAS — Parser.java:5777
            # setQuery(parseSelect()); optional column list renames)
            from .dialect import rewrite

            name = m.group("name").lower()
            if name in self.catalog.tables:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"table already exists: {name}")
            df = self.spark.sql(rewrite(m.group("query"), session=self.session))
            if m.group("cols"):
                new_names = [c.strip().lower() for c in m.group("cols").split(",")]
                if len(new_names) != len(df.columns):
                    raise ValueError(
                        f"CTAS column list has {len(new_names)} names for "
                        f"{len(df.columns)} query columns"
                    )
                df = df.toDF(*new_names)
            st = SnapshotTable(self.spark, self.catalog.warehouse, name)
            st.create(df)
            self.catalog.tables[name] = st
            self.catalog.table_ddl[name] = s
            self.catalog.constraints[name] = TableConstraints()
            self.catalog.refresh_view(name)
            return self._ok(f"created table {name} as select")

        m = re.match(
            rf"CREATE\s+MATERIALIZED\s+VIEW\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            rf"(?P<name>{_IDENT})\s+AS\s+(?P<query>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # Materialized view (extension — the reference has only
            # virtual views, TableView.java): the defining query runs
            # once into a snapshot table; reads scan the stored result;
            # REFRESH re-runs the query into a new snapshot.
            from .dialect import rewrite

            name = m.group("name").lower()
            if name in self.catalog.mat_views:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"materialized view already exists: {name}")
            q = m.group("query").strip()
            df = self.spark.sql(rewrite(q, session=self.session))
            st = SnapshotTable(self.spark, self.catalog.warehouse, name)
            st.create(df)
            self.catalog.tables[name] = st
            self.catalog.mat_views[name] = q
            base = self._mv_base_table(q)
            if base is not None:
                self.catalog.mv_base[name] = (
                    base,
                    self.catalog.tables[base].version,
                )
            self.catalog.table_ddl[name] = s
            self.catalog.constraints[name] = TableConstraints()
            self.catalog.refresh_view(name)
            return self._ok(f"created materialized view {name}")

        m = re.match(
            rf"CREATE\s+(?P<or_replace>OR\s+REPLACE\s+)?(?:FORCE\s+)?VIEW\s+"
            rf"(?P<name>{_IDENT})\s*(?:\([^)]*\)\s*)?AS\s+(?P<query>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            from .dialect import rewrite

            name = m.group("name").lower()
            if name in self.catalog.views and not m.group("or_replace"):
                raise ValueError(f"view already exists: {name}")
            q = rewrite(m.group("query"), session=self.session)
            self.spark.sql(q).createOrReplaceTempView(name)
            self.catalog.views[name] = q
            return self._ok(f"created view {name}")

        m = re.match(
            rf"CREATE\s+(?P<unique>UNIQUE\s+)?(?:HASH\s+)?INDEX\s+"
            rf"(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})\s+ON\s+"
            rf"(?P<table>{_IDENT})\s*\((?P<cols>[^)]*)\)\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # indexes are metadata-only: Catalyst + parquet stats subsume
            # BTree access paths (SURVEY.md §2.1)
            name = m.group("name").lower()
            self.catalog.indexes[name] = IndexMeta(
                name,
                m.group("table").lower(),
                [c.strip().lower() for c in m.group("cols").split(",")],
                unique=bool(m.group("unique")),
            )
            return self._ok(f"created index {name} (metadata only)")

        m = re.match(
            rf"CREATE\s+SEQUENCE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
            rf"(?:\s+START\s+WITH\s+(?P<start>-?\d+))?"
            rf"(?:\s+INCREMENT\s+BY\s+(?P<inc>-?\d+))?"
            rf"(?:\s+CACHE\s+(?P<cache>\d+))?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            self.session.create_sequence(
                m.group("name"),
                start=int(m.group("start") or 1),
                increment=int(m.group("inc") or 1),
                cache=int(m.group("cache") or 32),
            )
            return self._ok(f"created sequence {m.group('name').lower()}")

        m = re.match(
            rf"CREATE\s+DOMAIN\s+(?P<name>{_IDENT})\s+AS\s+(?P<base>.+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            # CREATE DOMAIN (UserDataType.java): alias for a base type
            base = m.group("base").strip().split()[0].lower()
            self.catalog.domains[m.group("name").lower()] = TYPE_MAP.get(base, "string")
            return self._ok(f"created domain {m.group('name').lower()}")

        m = re.match(
            rf"CREATE\s+SCHEMA\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
            rf"(?:\s+AUTHORIZATION\s+(?P<owner>{_IDENT}))?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # CREATE SCHEMA (ddl/CreateSchema.java): namespace registry
            # entry; objects remain flat-named like the reference's default
            # PUBLIC-schema usage
            name = m.group("name").lower()
            if name in self.catalog.schemas:
                if re.search(r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE):
                    return self._ok("exists")
                raise ValueError(f"schema already exists: {name}")
            self.catalog.schemas[name] = (m.group("owner") or "sa").lower()
            return self._ok(f"created schema {name}")

        m = re.match(
            rf"CREATE\s+CONSTANT\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT})"
            rf"\s+VALUE\s+(?P<expr>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # CREATE CONSTANT (ddl/CreateConstant.java): named scalar bound
            # at definition time, substituted by the dialect rewriter
            name = m.group("name").lower()
            if name in self.catalog.constants and not re.search(
                r"IF\s+NOT\s+EXISTS", s, re.IGNORECASE
            ):
                raise ValueError(f"constant already exists: {name}")
            self.catalog.constants[name] = m.group("expr").strip()
            return self._ok(f"created constant {name}")

        m = re.match(
            rf"CREATE\s+USER\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT}).*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # auth objects: catalog-level stubs (SURVEY.md §2.11)
            self.catalog.principals.add(m.group("name").lower())
            return self._ok(f"created principal {m.group('name').lower()}")

        m = re.match(
            rf"CREATE\s+ROLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>{_IDENT}).*$",
            s,
            re.IGNORECASE,
        )
        if m:
            self.catalog.roles.add(m.group("name").lower())
            return self._ok(f"created role {m.group('name').lower()}")

        m = re.match(
            rf"CREATE\s+(?:FORCE\s+)?TRIGGER\s+(?:IF\s+NOT\s+EXISTS\s+)?"
            rf"(?P<name>{_IDENT})\b.*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # triggers have no meaning without OLTP row events (SURVEY
            # §2.11) — recorded for INFORMATION_SCHEMA.TRIGGERS, never fired
            self.catalog.triggers[m.group("name").lower()] = s
            return self._ok("ok (trigger recorded: no row-event runtime)")

        m = re.match(
            rf"CREATE\s+(?:FORCE\s+)?ALIAS\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
            rf"(?P<name>{_IDENT})\s+(?:DETERMINISTIC\s+)?"
            rf"(?:FOR\s+\"(?P<target>[^\"]+)\"|AS\s+(?P<src>\$\$.*\$\$|'(?:[^']|'')*'))\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._create_alias(s, m)

        m = re.match(
            rf"CREATE\s+(?:FORCE\s+)?AGGREGATE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
            rf"(?P<name>{_IDENT})\s+FOR\s+\"(?P<target>[^\"]+)\"\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # CREATE AGGREGATE (ddl/CreateAggregate.java): the named class
            # must implement the 4-method protocol (AggregateFunction.java:
            # 16-50); registered as a grouped-agg pandas UDF so plain SQL
            # GROUP BY can call it
            name = m.group("name").upper()
            if name in self.session.udfs.aggregates:
                if m.group("ine"):
                    return self._ok("exists")
                raise ValueError(f"function alias already exists: {name}")
            cls = _import_dotted(m.group("target"))
            self.session.udfs.create_sql_aggregate(name, cls)
            self.session.fn_alias_ddl[name] = s
            return self._ok(f"created aggregate {name}")

        raise ValueError(f"unsupported CREATE statement: {s[:80]}")

    # java.lang.Math/StrictMath methods → the Spark builtin with matching
    # semantics (the reference's own test aliases are Math methods, e.g.
    # CreateFunctionAlias 'FOR "java.lang.Math.sqrt"'); calls rewrite to
    # the builtin name and stay inside whole-stage codegen
    _JAVA_BUILTINS = {
        "sqrt": "sqrt", "abs": "abs", "floor": "floor", "ceil": "ceil",
        "exp": "exp", "log": "ln", "log10": "log10", "sin": "sin",
        "cos": "cos", "tan": "tan", "asin": "asin", "acos": "acos",
        "atan": "atan", "atan2": "atan2", "pow": "power", "round": "round",
        "signum": "sign", "hypot": "hypot", "cbrt": "cbrt",
        "todegrees": "degrees", "toradians": "radians", "random": "rand",
        "max": "greatest", "min": "least",
    }

    def _create_alias(self, s: str, m: re.Match) -> DataFrame:
        """CREATE ALIAS (ddl/CreateFunctionAlias.java:25): the reference
        binds a Java method (``FOR "class.method"``) or compiles inline
        Java source (``AS '...'``). Spark-first mapping, in order:

        1. ``FOR "java.lang.Math.x"`` (and any method whose basename is a
           known builtin): pure rewrite to the Spark builtin — zero UDF
           cost, fully codegen'd.
        2. ``FOR "python.module.attr"``: import the callable, register it
           as a UDF (vectorized if it's annotated pd.Series → pd.Series).
        3. ``AS '<python source>'``: exec the source, register the first
           function it defines (the inline-source form, JavaMethod
           compilation in the reference).

        Result type for python UDFs comes from the callable's return
        annotation (default string, like H2's VARCHAR fallback).
        """
        name = m.group("name").upper()
        exists = (
            name in self.session.fn_alias_builtins
            or name in self.session.udfs.aliases
        )
        if exists:
            if m.group("ine"):
                return self._ok("exists")
            raise ValueError(f"function alias already exists: {name}")
        target, src = m.group("target"), m.group("src")
        if target:
            basename = target.rsplit(".", 1)[-1].lower()
            if (
                target.lower().startswith(("java.lang.math.", "java.lang.strictmath."))
                and basename in self._JAVA_BUILTINS
            ):
                self.session.fn_alias_builtins[name] = self._JAVA_BUILTINS[basename]
                self.session.fn_alias_ddl[name] = s
                return self._ok(f"created alias {name} -> {self._JAVA_BUILTINS[basename]}")
            fn = _import_dotted(target)
        else:
            text = src.strip()
            if text.startswith("$$"):
                code = text[2:-2]
            else:
                code = text[1:-1].replace("''", "'")
            ns: dict = {}
            # dont_inherit: this module's `from __future__ import
            # annotations` must not leak into the user source (it would
            # stringify the return annotation we type-map below)
            exec(compile(code, f"<alias {name}>", "exec", dont_inherit=True), ns)
            fns = [v for v in ns.values() if callable(v) and not isinstance(v, type)]
            if not fns:
                raise ValueError(f"alias source defines no function: {name}")
            fn = fns[0]
        ann = getattr(fn, "__annotations__", {}).get("return")
        rtype = {
            int: "bigint", float: "double", str: "string", bool: "boolean",
            bytes: "binary", "int": "bigint", "float": "double",
            "str": "string", "bool": "boolean", "bytes": "binary",
        }.get(ann, "string")
        import pandas as _pd

        vectorized = ann is _pd.Series or ann in ("pd.Series", "pandas.Series")
        if vectorized:
            rtype = "double"
        self.session.udfs.create_alias(name, fn, rtype, vectorized=vectorized)
        self.session.fn_alias_ddl[name] = s
        return self._ok(f"created alias {name}")

    def _alter(self, s: str) -> DataFrame:
        """ALTER TABLE ADD/DROP/RENAME/ALTER COLUMN, RENAME TO; ALTER
        SEQUENCE; ALTER VIEW — schema evolution as a snapshot projection
        (free at any scale vs. the reference's in-place row rewrite,
        AlterTableAlterColumn.java; ALTER COLUMN <type> is the one variant
        that must rewrite data, done as a distributed cast-projection)."""
        m = re.match(
            rf"ALTER\s+SEQUENCE\s+(?P<name>{_IDENT})\s+(?P<rest>.+)$",
            s,
            re.IGNORECASE,
        )
        if m:
            # AlterSequence.java: RESTART WITH / INCREMENT BY
            seq = self.session.sequences.get(m.group("name").lower())
            if seq is None:
                raise KeyError(f"sequence not found: {m.group('name').lower()}")
            rest = m.group("rest")
            rm = re.search(r"RESTART\s+WITH\s+(-?\d+)", rest, re.IGNORECASE)
            if rm:
                with seq._lock:
                    seq._next = int(rm.group(1))
            im = re.search(r"INCREMENT\s+BY\s+(-?\d+)", rest, re.IGNORECASE)
            if im:
                with seq._lock:
                    seq.increment = int(im.group(1))
            return self._ok(f"altered sequence {seq.name}")

        m = re.match(
            rf"ALTER\s+VIEW\s+(?P<name>{_IDENT})\s+(?:RECOMPILE|AS\s+"
            rf"(?P<query>.+))$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # AlterView.java: recompile (re-resolve) or redefine
            from .dialect import rewrite

            name = m.group("name").lower()
            if name not in self.catalog.views:
                raise KeyError(f"view not found: {name}")
            if m.group("query"):
                q = rewrite(m.group("query"), session=self.session)
                self.catalog.views[name] = q
            self.spark.sql(self.catalog.views[name]).createOrReplaceTempView(name)
            return self._ok(f"altered view {name}")

        m = re.match(
            rf"ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+"
            rf"ALTER\s+COLUMN\s+(?P<col>{_IDENT})\s+(?P<rest>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            return self._alter_column(
                m.group("name").lower(), m.group("col").lower(), m.group("rest")
            )

        m = re.match(
            rf"ALTER\s+INDEX\s+(?P<name>{_IDENT})\s+RENAME\s+TO\s+"
            rf"(?P<new>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # AlterIndexRename (Parser.java:4737)
            name, new = m.group("name").lower(), m.group("new").lower()
            if name not in self.catalog.indexes:
                raise KeyError(f"index not found: {name}")
            meta = self.catalog.indexes.pop(name)
            self.catalog.indexes[new] = IndexMeta(
                new, meta.table, meta.columns, unique=meta.unique
            )
            return self._ok(f"renamed index {name} to {new}")

        m = re.match(
            rf"ALTER\s+SCHEMA\s+(?P<name>{_IDENT})\s+RENAME\s+TO\s+"
            rf"(?P<new>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # AlterSchemaRename (Parser.java:4699)
            name, new = m.group("name").lower(), m.group("new").lower()
            if name not in self.catalog.schemas:
                raise KeyError(f"schema not found: {name}")
            if name == "public":
                raise ValueError("cannot rename the public schema")
            self.catalog.schemas[new] = self.catalog.schemas.pop(name)
            return self._ok(f"renamed schema {name} to {new}")

        m = re.match(
            rf"ALTER\s+USER\s+(?P<name>{_IDENT})\s+"
            rf"(?P<op>SET\s+PASSWORD\s+.+|SET\s+SALT\s+.+|RENAME\s+TO\s+"
            rf"(?P<new>{_IDENT})|ADMIN\s+(?:TRUE|FALSE))\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # AlterUser (Parser.java:4827): rename is real; password/
            # salt/admin are recorded-only like CREATE USER (no auth
            # plane on this engine — documented §2.11 shim)
            name = m.group("name").lower()
            if name not in self.catalog.principals:
                raise KeyError(f"user not found: {name}")
            if m.group("new"):
                self.catalog.principals.discard(name)
                self.catalog.principals.add(m.group("new").lower())
                return self._ok(f"renamed user {name}")
            return self._ok(f"altered user {name}")

        if re.match(r"ALTER\s+DATABASE\b", s, re.IGNORECASE):
            # AlterDatabase (Parser.java:4705) — engine/runmode knobs are
            # cluster-manager concerns here; accept and record
            self.session.set_setting("__ALTER_DATABASE", s)
            return self._ok("altered database (recorded)")

        m = re.match(
            rf"ALTER\s+TABLE\s+(?P<name>{_IDENT})\s+"
            rf"(?P<op>ADD(?:\s+COLUMN)?|DROP(?:\s+COLUMN)?|"
            rf"RENAME\s+COLUMN|RENAME\s+TO)\s+(?P<rest>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"unsupported ALTER statement: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        op = re.sub(r"\s+", " ", m.group("op").upper())
        rest = m.group("rest").strip()
        df = st.read()
        if op.startswith("ADD"):
            cm = re.match(
                rf"\(?\s*({_IDENT})\s+({_IDENT})(\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?",
                rest,
                re.IGNORECASE,
            )
            col, typ = cm.group(1), cm.group(2).lower()
            args = (cm.group(3) or "").strip()
            spark_type = (
                f"decimal{args}"
                if typ in ("decimal", "numeric") and args
                else TYPE_MAP.get(typ, "string")
            )
            st.write(df.withColumn(col.lower(), F.lit(None).cast(spark_type)))
        elif op.startswith("DROP"):
            col = rest.split()[0].lower()
            st.write(df.drop(col))
        elif op == "RENAME COLUMN":
            cm = re.match(rf"({_IDENT})\s+TO\s+({_IDENT})", rest, re.IGNORECASE)
            st.write(df.withColumnRenamed(cm.group(1).lower(), cm.group(2).lower()))
        elif op == "RENAME TO":
            # logical rename only: catalog key changes, storage dir keeps
            # the original physical name (zero data movement)
            new = rest.split()[0].lower()
            self.catalog.tables[new] = self.catalog.tables.pop(name)
            self.spark.catalog.dropTempView(name)
            self.catalog.refresh_view(new)
            return self._ok(f"renamed {name} to {new}")
        self.catalog.refresh_view(name)
        return self._ok(f"altered {name}")

    def _alter_column(self, name: str, col: str, rest: str) -> DataFrame:
        """ALTER TABLE t ALTER COLUMN c ... (AlterTableAlterColumn.java):
        SET/DROP DEFAULT and NOT NULL are metadata flips; RENAME TO is a
        projection; a type change is the only data rewrite — a distributed
        cast-projection over the snapshot (map-only, no shuffle)."""
        st = self.catalog.table(name)
        cons = self.catalog.constraints.setdefault(name, TableConstraints())
        rest = rest.strip()

        m = re.match(r"SET\s+DEFAULT\s+(?P<expr>.+)$", rest, re.IGNORECASE | re.DOTALL)
        if m:
            cons.defaults[col] = m.group("expr").strip()
            return self._ok(f"altered {name}.{col} default")
        if re.match(r"DROP\s+DEFAULT\s*$", rest, re.IGNORECASE):
            cons.defaults.pop(col, None)
            return self._ok(f"altered {name}.{col} default")
        if re.match(r"SET\s+NOT\s+NULL\s*$", rest, re.IGNORECASE):
            if col not in cons.not_null:
                n_null = st.read().filter(F.col(col).isNull()).count()
                if n_null:
                    raise ValueError(
                        f"cannot SET NOT NULL: {n_null} NULL rows in {name}.{col}"
                    )
                cons.not_null.append(col)
            return self._ok(f"altered {name}.{col} not null")
        if re.match(r"(DROP\s+NOT\s+NULL|SET\s+NULL)\s*$", rest, re.IGNORECASE):
            if col in cons.not_null:
                cons.not_null.remove(col)
            return self._ok(f"altered {name}.{col} nullable")
        m = re.match(rf"RENAME\s+TO\s+(?P<new>{_IDENT})\s*$", rest, re.IGNORECASE)
        if m:
            new = m.group("new").lower()
            st.write(st.read().withColumnRenamed(col, new))
            for attr in ("not_null", "identity"):
                lst = getattr(cons, attr)
                if col in lst:
                    lst[lst.index(col)] = new
            for d in (cons.defaults, cons.computed):
                if col in d:
                    d[new] = d.pop(col)
            self.catalog.refresh_view(name)
            return self._ok(f"renamed {name}.{col} to {new}")
        # type change: [SET DATA TYPE] <type>[(p[,s])]
        m = re.match(
            rf"(?:SET\s+DATA\s+TYPE\s+)?(?P<typ>{_IDENT})"
            rf"(?P<args>\s*\(\s*\d+(\s*,\s*\d+)?\s*\))?\s*$",
            rest,
            re.IGNORECASE,
        )
        if m:
            typ = m.group("typ").lower()
            args = (m.group("args") or "").strip()
            spark_type = (
                f"decimal{args}"
                if typ in ("decimal", "numeric", "dec", "number") and args
                else TYPE_MAP.get(typ, "string")
            )
            st.write(st.read().withColumn(col, F.col(col).cast(spark_type)))
            self.catalog.refresh_view(name)
            return self._ok(f"altered {name}.{col} type to {spark_type}")
        raise ValueError(f"unsupported ALTER COLUMN: {rest[:80]}")

    def _runscript(self, s: str) -> DataFrame:
        """RUNSCRIPT FROM 'file' (RunScript.java): execute statements
        sequentially; ';' splits outside string literals."""
        m = re.match(r"RUNSCRIPT\s+FROM\s+'(?P<path>[^']+)'", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse RUNSCRIPT: {s[:80]}")
        with open(m.group("path")) as f:
            text = f.read()
        stmts, cur, in_str = [], [], False
        for ch in text:
            if ch == "'":
                in_str = not in_str
            if ch == ";" and not in_str:
                stmts.append("".join(cur))
                cur = []
            else:
                cur.append(ch)
        if "".join(cur).strip():
            stmts.append("".join(cur))
        n = 0
        for stmt in stmts:
            stmt = stmt.strip()
            if stmt and not stmt.startswith("--"):
                self.execute(stmt)
                n += 1
        return self._ok(f"ran {n} statements")

    def _prepare(self, s: str) -> DataFrame:
        m = re.match(
            rf"PREPARE\s+(?P<name>{_IDENT})\s+AS\s+(?P<body>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse PREPARE: {s[:80]}")
        self.session.prepare(m.group("name"), m.group("body"))
        return self._ok(f"prepared {m.group('name').lower()}")

    def _execute_prepared(self, s: str) -> DataFrame:
        m = re.match(
            rf"EXECUTE\s+SERVICE\s+(?P<svc>{_IDENT})\s+(?P<method>\w+)"
            rf"\s*\((?P<args>.*)\)\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            # EXECUTE SERVICE svc method(args) → driver-side dispatch to
            # the registered IMPLEMENT BY Python class (services.py)
            name = m.group("svc").lower()
            if name not in self.catalog.services:
                raise KeyError(f"service not found: {name}")
            args = [
                self._coerce(a.strip().strip("'"))
                for a in self._split_top_level(m.group("args"))
                if a.strip()
            ]
            result = self.session.call_service(name, m.group("method"), *args)
            return self.spark.createDataFrame(
                [(None if result is None else str(result),)], "result string"
            )
        m = re.match(rf"EXECUTE\s+(?P<name>{_IDENT})\s*$", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse EXECUTE: {s[:80]}")
        return self.execute(self.session.prepared[m.group("name").lower()])

    def _deallocate(self, s: str) -> DataFrame:
        m = re.match(
            rf"DEALLOCATE\s+(?:PLAN\s+)?(?P<name>{_IDENT})\s*$", s, re.IGNORECASE
        )
        self.session.prepared.pop(m.group("name").lower(), None)
        return self._ok("deallocated")

    def _grant_revoke(self, s: str) -> DataFrame:
        """GRANT/REVOKE (GrantRevoke.java): no enforcement (no auth layer),
        but grants are recorded so INFORMATION_SCHEMA RIGHTS /
        TABLE_PRIVILEGES enumerate them like the reference does."""
        m = re.match(
            rf"(?P<op>GRANT|REVOKE)\s+(?P<rights>[A-Z_,\s]+?)\s+ON\s+"
            rf"(?P<obj>{_IDENT})\s+(?:TO|FROM)\s+(?P<who>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            rights = re.sub(r"\s+", " ", m.group("rights").strip().upper())
            entry = (m.group("who").lower(), rights, m.group("obj").lower())
            if m.group("op").upper() == "GRANT":
                if entry not in self.catalog.grants:
                    self.catalog.grants.append(entry)
            else:
                self.catalog.grants = [
                    g for g in self.catalog.grants if g != entry
                ]
            return self._ok("ok (recorded: no auth enforcement)")
        # role grants: GRANT role TO user
        m = re.match(
            rf"(?P<op>GRANT|REVOKE)\s+(?P<role>{_IDENT})\s+(?:TO|FROM)\s+"
            rf"(?P<who>{_IDENT})\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            entry = (m.group("who").lower(), "ROLE", m.group("role").lower())
            if m.group("op").upper() == "GRANT":
                if entry not in self.catalog.grants:
                    self.catalog.grants.append(entry)
            else:
                self.catalog.grants = [
                    g for g in self.catalog.grants if g != entry
                ]
            return self._ok("ok (recorded: no auth enforcement)")
        return self._ok("ok (no-op: no auth layer)")

    def _comment(self, s: str) -> DataFrame:
        """COMMENT ON <kind> <name> IS 'text' — recorded; surfaces as the
        REMARKS column of the matching INFORMATION_SCHEMA view."""
        m = re.match(
            rf"COMMENT\s+ON\s+(?P<kind>\w+)\s+(?P<name>{_IDENT}(?:\.{_IDENT})?)"
            rf"\s+IS\s+(?:'(?P<text>[^']*)'|(?P<null>NULL))\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m:
            key = m.group("name").lower()
            if m.group("null") is not None:
                self.catalog.comments.pop(key, None)
            else:
                self.catalog.comments[key] = m.group("text")
        return self._ok("ok (comment recorded)")

    def _drop(self, s: str) -> DataFrame:
        if re.match(r"DROP\s+ALL\s+OBJECTS\s*$", s, re.IGNORECASE):
            # DropDatabase.java (DROP ALL OBJECTS): clear every schema
            # object; the dumped SCRIPT of the reference starts with this
            for name in list(self.catalog.tables):
                self.catalog.tables.pop(name).drop()
                self.spark.catalog.dropTempView(name)
            for vname in list(self.catalog.views):
                self.spark.catalog.dropTempView(vname)
            self.catalog.table_ddl.clear()
            self.catalog.views.clear()
            self.catalog.indexes.clear()
            self.catalog.domains.clear()
            self.catalog.constraints.clear()
            self.catalog.constants.clear()
            self.catalog.triggers.clear()
            self.catalog.grants.clear()
            self.catalog.comments.clear()
            self.catalog.schemas = {"public": "sa"}
            self.session.sequences.clear()
            return self._ok("dropped all objects")
        m = re.match(
            rf"DROP\s+(?P<kind>MATERIALIZED\s+VIEW|TABLE|VIEW|INDEX|SEQUENCE|"
            rf"TRIGGER|SCHEMA|CONSTANT|ROLE|USER|DOMAIN|ALIAS|AGGREGATE|SERVICE)\s+"
            rf"(?:IF\s+EXISTS\s+)?(?P<name>{_IDENT})\s*(?P<mode>CASCADE|RESTRICT)?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"unsupported DROP statement: {s[:80]}")
        kind = re.sub(r"\s+", " ", m.group("kind").upper())
        name = m.group("name").lower()
        if_exists = re.search(r"IF\s+EXISTS", s, re.IGNORECASE)
        if kind == "MATERIALIZED VIEW":
            if name not in self.catalog.mat_views:
                if if_exists:
                    return self._ok("absent")
                raise KeyError(f"materialized view not found: {name}")
            self.catalog.mat_views.pop(name)
            self.catalog.tables.pop(name).drop()
            self.catalog.table_ddl.pop(name, None)
            self.spark.catalog.dropTempView(name)
            return self._ok(f"dropped materialized view {name}")
        if kind == "TABLE":
            if name not in self.catalog.tables:
                if if_exists:
                    return self._ok("absent")
                raise KeyError(f"table not found: {name}")
            # Shallow clones hold symlinks into this table's physical
            # files; a hard delete would silently corrupt them (VACUUM
            # already protects via _external_refs — DROP is the other
            # hard-delete path). RESTRICT by default; CASCADE drops the
            # dependent clones first (recursively, clone-of-clone safe).
            deps = self._dependent_tables(name)
            if deps:
                if (m.group("mode") or "").upper() != "CASCADE":
                    raise ValueError(
                        f"cannot drop table {name}: shallow clone(s) "
                        f"{sorted(deps)} link into its files; drop them "
                        f"first or use DROP TABLE {name} CASCADE"
                    )
                for dep in sorted(deps):
                    self._drop(f"DROP TABLE IF EXISTS {dep} CASCADE")
            self.catalog.tables.pop(name).drop()
            self.catalog.table_ddl.pop(name, None)
            self.spark.catalog.dropTempView(name)
        elif kind == "VIEW":
            if self.catalog.views.pop(name, None) is None and not if_exists:
                raise KeyError(f"view not found: {name}")
            self.spark.catalog.dropTempView(name)
        elif kind == "INDEX":
            if self.catalog.indexes.pop(name, None) is None and not if_exists:
                raise KeyError(f"index not found: {name}")
        elif kind == "SEQUENCE":
            if self.session.sequences.pop(name, None) is None and not if_exists:
                raise KeyError(f"sequence not found: {name}")
        elif kind == "TRIGGER":
            self.catalog.triggers.pop(name, None)
        elif kind == "SCHEMA":
            if name == "public":
                raise ValueError("cannot drop the public schema")
            if self.catalog.schemas.pop(name, None) is None and not if_exists:
                raise KeyError(f"schema not found: {name}")
        elif kind == "CONSTANT":
            if self.catalog.constants.pop(name, None) is None and not if_exists:
                raise KeyError(f"constant not found: {name}")
        elif kind == "SERVICE":
            if self.catalog.services.pop(name, None) is None and not if_exists:
                raise KeyError(f"service not found: {name}")
        elif kind == "ROLE":
            if name in self.catalog.roles:
                self.catalog.roles.discard(name)
            elif not if_exists:
                raise KeyError(f"role not found: {name}")
        elif kind == "USER":
            if name in self.catalog.principals:
                self.catalog.principals.discard(name)
            elif not if_exists:
                raise KeyError(f"user not found: {name}")
        elif kind == "DOMAIN":
            if self.catalog.domains.pop(name, None) is None and not if_exists:
                raise KeyError(f"domain not found: {name}")
        elif kind == "ALIAS":
            # DropFunctionAlias.java; a python-registered UDF stays in the
            # Spark function registry but is removed from the engine
            # catalog (no longer scripted, builtin rewrites stop)
            uname = name.upper()
            had = (
                self.session.fn_alias_builtins.pop(uname, None) is not None
                or uname in self.session.udfs.aliases
            )
            self.session.udfs.drop_alias(uname)
            self.session.fn_alias_ddl.pop(uname, None)
            if not had and not if_exists:
                raise KeyError(f"alias not found: {name}")
        elif kind == "AGGREGATE":
            uname = name.upper()
            if uname not in self.session.udfs.aggregates and not if_exists:
                raise KeyError(f"aggregate not found: {name}")
            self.session.udfs.drop_aggregate(uname)
            self.session.fn_alias_ddl.pop(uname, None)
        return self._ok(f"dropped {kind.lower()} {name}")

    # -- DML -------------------------------------------------------------
    def _insert(self, s: str) -> DataFrame:
        m = re.match(
            rf"INSERT\s+INTO\s+(?P<name>{_IDENT})\s*"
            rf"(?:\((?P<cols>[^)]*)\)\s*)?"
            rf"(?P<rest>(?:DIRECT\s+)?(?:VALUES\s*.+|SELECT\s+.+|WITH\s+.+"
            rf"|\(\s*SELECT\s+.+)|DEFAULT\s+VALUES|SET\s+.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse INSERT: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        target_cols = [f.name for f in st.read().schema.fields]
        rest = m.group("rest").strip()
        cols = (
            [c.strip().lower() for c in m.group("cols").split(",")]
            if m.group("cols")
            else target_cols
        )
        from .dialect import rewrite

        if rest.upper().startswith("DIRECT"):
            # INSERT … DIRECT query (Parser.java:1030 setInsertFromSelect):
            # a single-node buffering hint — snapshot inserts already
            # stream straight from the source plan
            rest = rest[len("DIRECT"):].strip()
        if re.match(r"DEFAULT\s+VALUES$", rest, re.IGNORECASE):
            # INSERT INTO t DEFAULT VALUES (Parser.java:1033): one row,
            # every column from its DEFAULT/IDENTITY (the alignment step
            # below fills all of them — the source carries no columns)
            src = self.spark.sql("SELECT 1 AS __dummy")
        elif rest.upper().startswith("SET"):
            # MySQL-style INSERT … SET a = 1, b = 'x' (Parser.java:1053)
            pairs = self._split_top_level(rest[len("SET"):])
            cols, vals = [], []
            for pr in pairs:
                k, v = pr.split("=", 1)
                cols.append(k.strip().lower())
                vals.append(v.strip())
            src = self.spark.sql(
                f"SELECT * FROM (VALUES ({', '.join(vals)})) "
                f"AS t({', '.join(cols)})"
            )
        elif rest.upper().startswith("VALUES"):
            src = self.spark.sql(
                f"SELECT * FROM ({rewrite(rest, session=self.session)}) "
                f"AS t({', '.join(cols)})"
            )
        else:
            src = self.spark.sql(rewrite(rest.strip("()"), session=self.session)).toDF(
                *cols
            )
        # align to target schema: missing columns → DEFAULT expr (falling
        # back to NULL), computed columns recomputed, order normalized
        cons = self.catalog.constraints.get(name, TableConstraints())
        target_schema = dict(st.read().dtypes)

        def source_col(c: str):
            if c in cons.computed:
                return F.expr(cons.computed[c])
            if c in src.columns:
                return F.col(c)
            if c in cons.identity:
                # IDENTITY auto-fill (Column.java:78): a driver-reserved
                # block offset + per-row monotonic id — unique without any
                # executor coordination; gaps allowed (same as reference)
                seq = self.session.sequences.get(f"__identity_{name}")
                if seq is None:
                    seq = self.session.create_sequence(f"__identity_{name}", start=1)
                offset, _ = seq.next_block(1 << 40)
                return F.lit(offset) + F.monotonically_increasing_id()
            if c in cons.defaults:
                return F.expr(cons.defaults[c])
            return F.lit(None)

        aligned = src.select(
            *[source_col(c).cast(target_schema[c]).alias(c) for c in target_cols]
        )
        self._validate_write(name, aligned, incoming_only=True)
        st.insert(aligned)
        self.catalog.refresh_view(name)
        return self._ok(f"inserted into {name}")

    def _validate_write(
        self, name: str, incoming: DataFrame, incoming_only: bool = False
    ) -> None:
        """Write-time constraint enforcement (Column.java:71-78 CHECK /
        NOT NULL; GlobalUniqueIndex.java:33 uniqueness as a group-count
        validation). One validation job per constrained write."""
        cons = self.catalog.constraints.get(name)
        if cons:
            conds = [F.col(c).isNull() for c in cons.not_null if c in incoming.columns]
            conds += [
                ~F.coalesce(F.expr(e), F.lit(False)) for e in cons.checks
            ]
            if conds:
                viol = None
                for c in conds:
                    viol = c if viol is None else (viol | c)
                n_bad = incoming.filter(viol).count()
                if n_bad:
                    raise ValueError(
                        f"constraint violation on {name}: {n_bad} row(s) "
                        f"fail NOT NULL/CHECK"
                    )
        # uniqueness: PK + unique indexes over the post-write table state
        unique_sets = [
            m.columns
            for m in self.catalog.indexes.values()
            if m.unique and m.table == name
        ]
        if unique_sets:
            st = self.catalog.tables[name]
            combined = (
                st.read().select(incoming.columns).unionByName(incoming)
                if incoming_only and st.exists()
                else incoming
            )
            for cols in unique_sets:
                if not all(c in combined.columns for c in cols):
                    continue
                # H2/Lealone unique indexes allow any number of NULLs
                # (NULL != NULL for uniqueness) — exclude rows with a NULL
                # in the indexed column set from the duplicate count.
                no_nulls = None
                for c in cols:
                    cond = F.col(c).isNotNull()
                    no_nulls = cond if no_nulls is None else (no_nulls & cond)
                dup = (
                    combined.filter(no_nulls)
                    .groupBy(*cols)
                    .count()
                    .filter(F.col("count") > 1)
                    .limit(1)
                    .count()
                )
                if dup:
                    raise ValueError(
                        f"unique constraint violation on {name}({', '.join(cols)})"
                    )

    def _update(self, s: str) -> DataFrame:
        m = re.match(
            rf"UPDATE\s+(?P<name>{_IDENT})\s+SET\s+(?P<sets>.+?)"
            rf"(?:\s+WHERE\s+(?P<where>.+?))?(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse UPDATE: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        assignments = {}
        for part in self._split_top_level(m.group("sets")):
            k, v = part.split("=", 1)
            assignments[k.strip().lower()] = F.expr(v.strip())
        cond = F.expr(m.group("where")) if m.group("where") else F.lit(True)
        if m.group("limit"):
            from .operators.dml import apply_update_limit

            pk = self._pk_of(name)
            new_df = apply_update_limit(
                st.read(), cond, assignments, int(m.group("limit")), pk
            )
        else:
            from .operators.dml import apply_update

            new_df = apply_update(st.read(), cond, assignments)
        self._validate_write(name, new_df)
        st.write(new_df)
        self.catalog.refresh_view(name)
        return self._ok(f"updated {name}")

    def _delete(self, s: str) -> DataFrame:
        m = re.match(
            rf"DELETE\s+FROM\s+(?P<name>{_IDENT})"
            rf"(?:\s+WHERE\s+(?P<where>.+?))?(?:\s+LIMIT\s+(?P<limit>\d+))?\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            raise ValueError(f"cannot parse DELETE: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        cond = F.expr(m.group("where")) if m.group("where") else F.lit(True)
        if m.group("limit"):
            # DELETE LIMIT: first n matching rows in PK order (Delete.java:34)
            pk = self._pk_of(name)
            df = st.read()
            picked = (
                df.filter(cond.isNotNull() & cond)
                .select(*pk)
                .orderBy(*pk)
                .limit(int(m.group("limit")))
                .withColumn("__del", F.lit(True))
            )
            remaining = (
                df.join(F.broadcast(picked), on=pk, how="left")
                .filter(F.col("__del").isNull())
                .drop("__del")
            )
            st.write(remaining)
        else:
            st.delete(cond)
        self.catalog.refresh_view(name)
        return self._ok(f"deleted from {name}")

    def _merge(self, s: str) -> DataFrame:
        m = re.match(
            rf"MERGE\s+INTO\s+(?P<name>{_IDENT})\s*"
            rf"(?:\((?P<cols>[^)]*)\)\s*)?KEY\s*\((?P<keys>[^)]*)\)\s*"
            rf"(?P<rest>VALUES\s*.+|SELECT\s+.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            if re.search(r"\bUSING\b", s, re.IGNORECASE):
                return self._merge_ansi(s)
            raise ValueError(f"cannot parse MERGE (expected KEY(...) form): {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        target_cols = [f.name for f in st.read().schema.fields]
        cols = (
            [c.strip().lower() for c in m.group("cols").split(",")]
            if m.group("cols")
            else target_cols
        )
        keys = [k.strip().lower() for k in m.group("keys").split(",")]
        rest = m.group("rest").strip()
        from .dialect import rewrite

        if rest.upper().startswith("VALUES"):
            src = self.spark.sql(
                f"SELECT * FROM ({rewrite(rest, session=self.session)}) "
                f"AS t({', '.join(cols)})"
            )
        else:
            src = self.spark.sql(rewrite(rest, session=self.session)).toDF(*cols)
        target_schema = dict(st.read().dtypes)
        aligned = src.select(
            *[
                (F.col(c) if c in src.columns else F.lit(None))
                .cast(target_schema[c])
                .alias(c)
                for c in target_cols
            ]
        )
        # partial-row source (cols ⊂ target): keep target values for
        # unspecified columns by coalescing after the key join
        if set(cols) < set(target_cols):
            existing = st.read()
            sdf = aligned.select(
                *[F.col(c).alias(f"__n_{c}") for c in target_cols]
            )
            cond = None
            for k in keys:
                c = existing[k] == sdf[f"__n_{k}"]
                cond = c if cond is None else cond & c
            joined = sdf.join(existing, cond, "left")
            aligned = joined.select(
                *[
                    (
                        F.col(f"__n_{c}")
                        if c in cols or c in keys
                        else F.coalesce(existing[c], F.col(f"__n_{c}"))
                    ).alias(c)
                    for c in target_cols
                ]
            )
        merged = merge_by_key(st.read(), aligned, keys)
        self._validate_write(name, merged)
        st.write(merged)
        self.catalog.refresh_view(name)
        return self._ok(f"merged into {name}")

    def _merge_ansi(self, s: str) -> DataFrame:
        """ANSI MERGE extension (beyond the reference's KEY form):

        ``MERGE INTO t [AS ta] USING <table | (subquery)> [AS sa]
        ON <cond> [WHEN MATCHED [AND guard] THEN {UPDATE SET ... | DELETE}]
        [WHEN NOT MATCHED THEN INSERT [(cols)] VALUES (exprs)]``

        Either WHEN clause may be omitted (insert-only MERGE is ANSI-legal).
        Execution delegates to :func:`operators.dml.merge_ansi` — ONE
        full-outer join with all branches (including the ANSI
        duplicate-match guard) derived from its presence flags.
        """
        m = re.match(
            rf"MERGE\s+INTO\s+(?P<name>{_IDENT})(?:\s+AS\s+(?P<ta>{_IDENT}))?\s+"
            rf"USING\s+(?P<src>\((?:[^()]|\([^()]*\))*\)|{_IDENT})"
            rf"(?:\s+AS\s+(?P<sa>{_IDENT}))?\s+"
            rf"ON\s+(?P<cond>.+?)"
            rf"(?:\s+WHEN\s+MATCHED\s*(?:AND\s+(?P<mguard>.+?)\s+)?"
            rf"THEN\s+(?P<matched>UPDATE\s+SET\s+.+?|DELETE))?"
            rf"(?:\s+WHEN\s+NOT\s+MATCHED\s+THEN\s+INSERT\s*"
            rf"(?:\((?P<icols>[^)]*)\)\s*)?VALUES\s*\((?P<ivals>.+)\))?\s*$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if not m or (m.group("matched") is None and m.group("ivals") is None):
            raise ValueError(f"cannot parse ANSI MERGE: {s[:120]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        target = st.read()
        target_cols = [f.name for f in target.schema.fields]
        ta = (m.group("ta") or name).lower()
        sa = (m.group("sa") or "__merge_src").lower()
        src_sql = m.group("src")
        from .dialect import rewrite
        from .operators.dml import ANSI_MERGE_DUP_MSG, merge_ansi

        if src_sql.startswith("("):
            src = self.spark.sql(rewrite(src_sql[1:-1], session=self.session))
        else:
            src = self.spark.table(src_sql.lower())

        def rw(txt: str) -> str:
            # resolve alias-qualified refs into the kernel's joined
            # namespace: sa.x -> __s_x, ta.x -> x
            e = re.sub(
                rf"\b{re.escape(sa)}\s*\.\s*(\w+)", r"__s_\1", txt, flags=re.IGNORECASE
            )
            return re.sub(
                rf"\b{re.escape(ta)}\s*\.\s*(\w+)", r"\1", e, flags=re.IGNORECASE
            )

        on = F.expr(rw(m.group("cond")))
        guard = m.group("mguard")
        guard_col = F.expr(rw(guard)) if guard else None
        matched = (m.group("matched") or "").strip()
        delete_matched = matched.upper() == "DELETE"
        update_set = None
        if matched and not delete_matched:
            update_set = {}
            for assign in re.split(r",(?![^()]*\))", matched[len("UPDATE SET"):]):
                col, expr = assign.split("=", 1)
                key = col.strip().lower().removeprefix(f"{ta}.")
                update_set[key] = F.expr(rw(expr.strip()))
        insert_values = None
        if m.group("ivals"):
            icols = (
                [c.strip().lower() for c in m.group("icols").split(",")]
                if m.group("icols")
                else target_cols
            )
            ivals = [v.strip() for v in re.split(r",(?![^()]*\))", m.group("ivals"))]
            if len(icols) != len(ivals):
                raise ValueError("ANSI MERGE: INSERT column/value count mismatch")
            insert_values = {c: F.expr(rw(v)) for c, v in zip(icols, ivals)}
        merged = merge_ansi(
            target,
            src,
            on,
            update_set=update_set,
            delete_matched=delete_matched,
            matched_guard=guard_col,
            insert_values=insert_values,
        )
        try:
            self._validate_write(name, merged)
            st.write(merged)
        except Exception as e:  # surface the runtime dup-guard as ValueError
            if ANSI_MERGE_DUP_MSG in str(e):
                raise ValueError(ANSI_MERGE_DUP_MSG) from e
            raise
        self.catalog.refresh_view(name)
        return self._ok(f"merged into {name}")

    def _truncate(self, s: str) -> DataFrame:
        m = re.match(rf"TRUNCATE\s+TABLE\s+(?P<name>{_IDENT})\s*$", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse TRUNCATE: {s[:80]}")
        name = m.group("name").lower()
        self.catalog.table(name).truncate()
        self.catalog.refresh_view(name)
        return self._ok(f"truncated {name}")

    # -- utility ---------------------------------------------------------
    def _explain(self, s: str) -> DataFrame:
        from .dialect import rewrite

        body = s.split(None, 1)[1]
        if body.upper().startswith("ANALYZE"):
            body = body.split(None, 1)[1]
        df = self.spark.sql(rewrite(body, session=self.session))
        plan = df._jdf.queryExecution().explainString(
            self.spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        return self.spark.createDataFrame(
            [(line,) for line in plan.splitlines()], "plan string"
        )

    # SET COLLATION name → Spark 4 native ICU collation (reference:
    # dml/Set.java COLLATION branch + CompareModeIcu4J.java). Mapping
    # shared with per-column DDL COLLATE — see module-level
    # collation_to_spark above _parse_columns.
    def _collation_to_spark(self, name: str, strength: str | None) -> str | None:
        return collation_to_spark(name, strength)

    def _set(self, s: str) -> DataFrame:
        m = re.match(
            rf"SET\s+COLLATION\s+(?P<name>{_IDENT})"
            rf"(?:\s+STRENGTH\s+(?P<strength>\w+))?\s*$",
            s,
            re.IGNORECASE,
        )
        if m:
            # reference parity (dml/Set.java:85-90): the database-level
            # compare mode cannot change once a user table exists —
            # ErrorCode.COLLATION_CHANGE_WITH_DATA_TABLE_1
            if self.catalog.tables:
                first = next(iter(self.catalog.tables))
                raise ValueError(
                    f"collation cannot be changed: data table exists ({first})"
                )
            spark_collation = self._collation_to_spark(
                m.group("name"), m.group("strength")
            )
            if spark_collation is not None:
                # validate eagerly so a bad locale fails at SET time like
                # the reference does (DbException INVALID_VALUE)
                try:
                    self.spark.sql(
                        f"SELECT 'x' COLLATE {spark_collation}"
                    ).collect()
                except Exception as exc:
                    raise ValueError(
                        f"unknown collation: {m.group('name')}"
                    ) from exc
            self.session.collation = spark_collation
            self.session.set_setting("COLLATION", m.group("name").upper())
            return self._ok(f"set collation {spark_collation or 'UTF8_BINARY'}")
        m = re.match(rf"SET\s+(?P<name>@?{_IDENT})\s*=?\s*(?P<val>.+)$", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse SET: {s[:80]}")
        name, val = m.group("name"), m.group("val").strip().strip("'")
        if name.startswith("@"):
            self.session.set_variable(name, self._coerce(val))
        else:
            self.session.set_setting(name, self._coerce(val))
        return self._ok(f"set {name}")

    def _call(self, s: str) -> DataFrame:
        from .dialect import rewrite

        expr = s.split(None, 1)[1]
        m = re.match(
            r"EXECUTE_SERVICE_(?P<kind>NO_RETURN_VALUE|WITH_RETURN_VALUE)"
            r"\s*\(\s*'(?P<target>[^']+)'\s*,\s*'(?P<json>[^']*)'\s*\)\s*$",
            expr.strip(),
            re.IGNORECASE,
        )
        if m:
            # The reference's SQL-level service entry points
            # (Function.java:379-380,951-965): target is
            # 'service_name.method_name', second arg a JSON array of
            # arguments. Dispatched driver-side like EXECUTE SERVICE.
            import json as _json

            target = m.group("target")
            svc, _, method = target.rpartition(".")
            if not svc:
                raise ValueError(
                    f"service target must be 'service.method': {target!r}"
                )
            raw = m.group("json")
            args = _json.loads(raw) if raw else []
            if not isinstance(args, list):
                args = [args]
            result = self.session.call_service(svc, method, *args)
            if m.group("kind").upper() == "NO_RETURN_VALUE":
                result = None
            return self.spark.createDataFrame(
                [(None if result is None else str(result),)], "result string"
            )
        return self.spark.sql(rewrite(f"SELECT {expr} AS result", session=self.session))

    def _script(self, s: str) -> DataFrame:
        """SCRIPT [NODATA] [TO 'file'] — dump the catalog (and data) as a
        replayable SQL script (reference: sql/ddl/Script.java, 723 LoC:
        settings, users/roles, schemas, sequences, constants, domains,
        tables + rows, indexes, triggers, grants, comments). RUNSCRIPT of
        the emitted script on a fresh session reproduces catalog + data
        (pinned by tests/test_ddl_extended.py round-trip)."""
        nodata = bool(re.search(r"\bNODATA\b", s, re.IGNORECASE))
        to_m = re.search(r"\bTO\s+'(?P<path>[^']+)'", s, re.IGNORECASE)
        cat = self.catalog
        ddl: list[str] = []
        for n in sorted(cat.schemas):
            if n != "public":
                ddl.append(
                    f"CREATE SCHEMA IF NOT EXISTS {n} "
                    f"AUTHORIZATION {cat.schemas[n]}"
                )
        for n in sorted(cat.principals):
            ddl.append(f"CREATE USER IF NOT EXISTS {n}")
        for n in sorted(cat.roles):
            if n != "public":
                ddl.append(f"CREATE ROLE {n}")
        for n, t in sorted(cat.domains.items()):
            ddl.append(f"CREATE DOMAIN {n} AS {t}")
        for seq in self.session.sequences.values():
            current = seq._next if seq._next is not None else seq.start
            ddl.append(
                f"CREATE SEQUENCE {seq.name} START WITH {current} "
                f"INCREMENT BY {seq.increment} CACHE {seq.cache}"
            )
        for n, expr in sorted(cat.constants.items()):
            ddl.append(f"CREATE CONSTANT {n} VALUE {expr}")
        for n, stmt in sorted(self.session.fn_alias_ddl.items()):
            ddl.append(stmt)
        for n, svc in sorted(cat.services.items()):
            ddl.append(svc.ddl)
        # data dump: stream rows partition-at-a-time (toLocalIterator) —
        # a SCRIPT of a lake-scale table must not materialize the whole
        # table on the driver (reference Script.java streams its result
        # set too). Marked so the file path below can also stream to disk
        # instead of accumulating INSERT strings in memory.
        data_marks: list[tuple[int, str]] = []  # (ddl index, table name)
        for name in cat.tables:
            ddl.append(cat.table_ddl.get(name, f"-- external table {name}"))
            if not nodata:
                data_marks.append((len(ddl), name))

        def _insert_rows(table: str):
            df = cat.tables[table].read()
            cols = ", ".join(df.columns)
            for row in df.toLocalIterator():
                vals = ", ".join(_sql_literal(v) for v in row)
                yield f"INSERT INTO {table} ({cols}) VALUES ({vals})"
        for m in cat.indexes.values():
            if not m.name.startswith("__pk_"):
                uq = "UNIQUE " if m.unique else ""
                ddl.append(
                    f"CREATE {uq}INDEX {m.name} ON {m.table} "
                    f"({', '.join(m.columns)})"
                )
        for v, q in cat.views.items():
            ddl.append(f"CREATE VIEW {v} AS {q}")
        for n, t in sorted(cat.triggers.items()):
            ddl.append(t)
        for who, r, obj in cat.grants:
            if r == "ROLE":
                ddl.append(f"GRANT {obj} TO {who}")
            else:
                ddl.append(f"GRANT {r} ON {obj} TO {who}")
        for obj, text in sorted(cat.comments.items()):
            kind = "TABLE" if obj in cat.tables else "COLUMN" if "." in obj else "TABLE"
            esc = text.replace("'", "''")
            ddl.append(f"COMMENT ON {kind} {obj} IS '{esc}'")
        if not ddl and not data_marks:
            ddl = ["-- empty catalog"]

        def _statements():
            """All script statements in replay order, INSERTs streamed."""
            marks = dict()
            for pos, tbl in data_marks:
                marks.setdefault(pos, []).append(tbl)
            for i, d in enumerate(ddl):
                yield d
                for tbl in marks.get(i + 1, ()):
                    yield from _insert_rows(tbl)

        if to_m:
            # stream to the file — constant driver memory at any table size
            with open(to_m.group("path"), "w") as f:
                for stmt in _statements():
                    f.write(stmt + ";\n")
            return self._ok(f"script written: {to_m.group('path')}")
        # in-memory result: the driver must hold the rows anyway (the
        # caller collects them); cap so SCRIPT-without-TO of a lake-scale
        # table fails loudly instead of OOMing the driver
        out, cap = [], 1_000_000
        for stmt in _statements():
            out.append(stmt)
            if len(out) > cap:
                raise RuntimeError(
                    "SCRIPT result exceeds 1e6 statements; use "
                    "SCRIPT TO 'file' (streamed) for large catalogs"
                )
        return self.spark.createDataFrame([(d,) for d in out], "script string")

    def _backup(self, s: str) -> DataFrame:
        """BACKUP TO 'file.zip' (reference: sql/dml/Backup.java — online
        zip of the database file). Here: zip of the warehouse directory
        (every table's snapshot tree), restorable by unzipping into a new
        session's warehouse path."""
        m = re.match(r"BACKUP\s+TO\s+'(?P<path>[^']+)'\s*$", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse BACKUP: {s[:80]}")
        import shutil

        path = m.group("path")
        base = path[:-4] if path.lower().endswith(".zip") else path
        out = shutil.make_archive(base, "zip", self.catalog.warehouse)
        return self._ok(f"backup written: {out}")

    def _mv_base_table(self, query: str) -> Optional[str]:
        """The single catalog snapshot table a simple MV query reads, or
        None (joins, subqueries, non-catalog sources). Exactly one FROM
        may appear — a WHERE-subquery's FROM would otherwise be rewritten
        onto the delta too and merge wrong partials."""
        if len(re.findall(r"\bFROM\b", query, re.IGNORECASE)) != 1:
            return None
        m = re.match(
            rf"\s*SELECT\s+.+?\s+FROM\s+(?P<base>{_IDENT})\s*"
            rf"(?:WHERE\s+.+?)?(?:GROUP\s+BY\s+.+?)?\s*$",
            query,
            re.IGNORECASE | re.DOTALL,
        )
        if not m:
            return None
        base = m.group("base").lower()
        return base if base in self.catalog.tables else None

    _MV_AGG = re.compile(
        r"^\s*(?P<fn>COUNT|SUM|MIN|MAX)\s*\(\s*(?P<arg>\*|[^()]+)\s*\)\s+"
        r"AS\s+(?P<alias>[A-Za-z_][A-Za-z0-9_]*)\s*$",
        re.IGNORECASE,
    )

    def _refresh(self, s: str) -> DataFrame:
        """``REFRESH MATERIALIZED VIEW <name> [INCREMENTALLY]``.

        Full refresh re-runs the defining query into a NEW snapshot
        (readers of the old snapshot are undisturbed; the refresh is
        atomic via the version flip). ``INCREMENTALLY`` consumes ONLY the
        base table's rows appended since the last refresh (file-level
        delta — SnapshotTable.inserted_since) and merges their partial
        aggregates into the stored result: supported for single-table
        GROUP BY queries whose aggregates are COUNT/SUM/MIN/MAX (the
        insert-mergeable family); anything else — or a base history that
        was not append-only — raises with the full-refresh suggestion.
        At scale this is the difference between re-scanning the whole
        base and scanning the day's new files.
        """
        m = re.match(
            rf"REFRESH\s+MATERIALIZED\s+VIEW\s+(?P<name>{_IDENT})"
            rf"(?P<inc>\s+INCREMENTALLY)?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse REFRESH: {s[:80]}")
        from .dialect import rewrite

        name = m.group("name").lower()
        if name not in self.catalog.mat_views:
            raise KeyError(f"materialized view not found: {name}")
        if m.group("inc"):
            return self._refresh_incremental(name)
        df = self.spark.sql(
            rewrite(self.catalog.mat_views[name], session=self.session)
        )
        self.catalog.tables[name].write(df)
        if name in self.catalog.mv_base:
            base, _ = self.catalog.mv_base[name]
            self.catalog.mv_base[name] = (base, self.catalog.tables[base].version)
        self.catalog.refresh_view(name)
        self.session.invalidate_cache()
        return self._ok(f"refreshed materialized view {name}")

    def _refresh_incremental(self, name: str) -> DataFrame:
        from pyspark.sql import functions as F

        from .dialect import rewrite

        query = self.catalog.mat_views[name]
        if name not in self.catalog.mv_base:
            raise ValueError(
                f"materialized view {name} has no snapshot-table base; "
                "use REFRESH MATERIALIZED VIEW (full)"
            )
        base, last_v = self.catalog.mv_base[name]
        qm = re.match(
            rf"\s*SELECT\s+(?P<select>.+?)\s+FROM\s+{base}\s*"
            rf"(?:WHERE\s+(?P<where>.+?))?\s*GROUP\s+BY\s+(?P<gb>.+?)\s*$",
            query,
            re.IGNORECASE | re.DOTALL,
        )
        if not qm or len(re.findall(r"\bFROM\b", query, re.IGNORECASE)) != 1:
            raise ValueError(
                f"materialized view {name} is not a single-table GROUP BY "
                "query; use REFRESH MATERIALIZED VIEW (full)"
            )
        group_cols = [c.strip().lower() for c in qm.group("gb").split(",")]
        aggs: dict[str, str] = {}  # alias -> fn
        # output columns in the ORIGINAL select-list order — an
        # incremental refresh must store the same column order a full
        # refresh would, or the MV's schema flips between refresh modes
        out_order: list[str] = []
        for item in qm.group("select").split(","):
            item = item.strip()
            if item.lower() in group_cols:
                out_order.append(item.lower())
                continue
            am = self._MV_AGG.match(item)
            if not am or re.match(
                r"\s*DISTINCT\b", am.group("arg"), re.IGNORECASE
            ):
                # DISTINCT aggregates are NOT insert-mergeable: adding
                # old and delta distinct counts double-counts values
                # seen in both — refuse rather than silently corrupt
                raise ValueError(
                    f"unsupported select item for incremental refresh: "
                    f"{item!r} (non-DISTINCT COUNT/SUM/MIN/MAX ... AS "
                    "alias only)"
                )
            aggs[am.group("alias").lower()] = am.group("fn").upper()
            out_order.append(am.group("alias").lower())
        st = self.catalog.tables[base]
        delta = st.inserted_since(last_v)  # raises if history not append-only
        view = f"__mv_delta_{name}"
        delta.createOrReplaceTempView(view)
        delta_agg = self.spark.sql(
            rewrite(
                re.sub(
                    rf"\bFROM\s+{base}\b", f"FROM {view}", query, flags=re.IGNORECASE
                ),
                session=self.session,
            )
        )
        old = self.catalog.tables[name].read()
        o, d = old.alias("o"), delta_agg.alias("d")
        joined = o.join(d, group_cols, "full_outer")

        def _merged(colname: str):
            if colname in group_cols:
                return F.coalesce(o[colname], d[colname]).alias(colname)
            fn, a, b = aggs[colname], o[colname], d[colname]
            if fn == "COUNT":
                expr = F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
            elif fn == "SUM":
                # SUM over an all-NULL input is NULL, not 0 — a brand-new
                # group whose summed column is entirely NULL must store
                # NULL exactly like a full refresh would; the result is 0
                # only if some side actually summed to 0
                expr = F.when(a.isNull() & b.isNull(), F.lit(None)).otherwise(
                    F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0))
                )
            elif fn == "MIN":
                expr = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
                    F.least(a, b)
                )
            else:  # MAX
                expr = F.when(a.isNull(), b).when(b.isNull(), a).otherwise(
                    F.greatest(a, b)
                )
            return expr.alias(colname)

        self.catalog.tables[name].write(
            joined.select(*[_merged(c) for c in out_order])
        )
        self.catalog.mv_base[name] = (base, st.version)
        self.catalog.refresh_view(name)
        self.session.invalidate_cache()
        return self._ok(f"incrementally refreshed materialized view {name}")

    def _vacuum(self, s: str) -> DataFrame:
        """``VACUUM <table> [RETAIN <n> VERSIONS]`` — drop snapshot
        versions older than the newest n (default 1), except those still
        referenced by surviving snapshots (SnapshotTable.vacuum's
        link-reachability rule). Time-travel reads of removed versions
        fail afterwards — the lakehouse retention contract."""
        m = re.match(
            rf"VACUUM\s+(?P<name>{_IDENT})"
            rf"(?:\s+RETAIN\s+(?P<n>\d+)\s+VERSIONS?)?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse VACUUM: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        keep = int(m.group("n") or 1)
        before = st.versions()
        st.vacuum(keep_last=keep, protected=self._external_refs(name))
        after = st.versions()
        return self._ok(
            f"vacuumed {name}: {len(before) - len(after)} snapshots removed, "
            f"{len(after)} kept"
        )

    def _external_refs(self, name: str) -> "set[int]":
        """Versions of ``name`` that OTHER registered tables link into —
        shallow clones hold links that the table's own vacuum
        reachability scan (which only walks its own dirs) cannot see.
        Metadata-only directory walk; transitive dependencies are then
        expanded by vacuum's existing reference graph."""
        st = self.catalog.table(name)
        base_real = os.path.realpath(os.path.join(st.root, st.name))
        refs: set[int] = set()
        for oname, ot in self.catalog.tables.items():
            if oname == name:
                continue
            obase = os.path.join(ot.root, ot.name)
            for dirpath, dirnames, filenames in os.walk(obase):
                for d in list(dirnames) + list(filenames):
                    p = os.path.join(dirpath, d)
                    if not os.path.islink(p):
                        continue
                    rp = os.path.realpath(p)
                    if not rp.startswith(base_real + os.sep):
                        continue
                    top = os.path.relpath(rp, base_real).split(os.sep, 1)[0]
                    if top.startswith("v") and top[1:].isdigit():
                        refs.add(int(top[1:]))
        return refs

    def _dependent_tables(self, name: str) -> "set[str]":
        """Names of OTHER registered tables holding symlinks that resolve
        into ``name``'s physical files — i.e. shallow clones of it (or of
        its clones). Same directory walk as :meth:`_external_refs` but
        keyed by owner table instead of version number; metadata-only."""
        st = self.catalog.tables.get(name)
        if st is None:
            return set()
        base_real = os.path.realpath(os.path.join(st.root, st.name))
        deps: set[str] = set()
        for oname, ot in self.catalog.tables.items():
            if oname == name:
                continue
            obase = os.path.join(ot.root, ot.name)
            for dirpath, dirnames, filenames in os.walk(obase):
                if oname in deps:
                    break
                for d in list(dirnames) + list(filenames):
                    p = os.path.join(dirpath, d)
                    if os.path.islink(p) and os.path.realpath(p).startswith(
                        base_real + os.sep
                    ):
                        deps.add(oname)
                        break
        return deps

    def _use(self, s: str) -> DataFrame:
        """``USE [=] schema`` (Parser.java:5063 parseUse — sugar for
        SET SCHEMA): switches the session's current schema after
        validating it exists, like the reference's Set(SetTypes.SCHEMA)."""
        m = re.match(rf"USE\s*=?\s*(?P<name>{_IDENT})\s*$", s, re.IGNORECASE)
        if not m:
            raise ValueError(f"cannot parse USE: {s[:80]}")
        name = m.group("name").lower()
        if name not in self.catalog.schemas:
            raise ValueError(f"schema not found: {name}")
        self.session.set_setting("SCHEMA", name.upper())
        return self._ok(f"schema {name}")

    def _shutdown(self, s: str) -> DataFrame:
        """``SHUTDOWN [IMMEDIATELY|COMPACT|DEFRAG]`` and ``SHUTDOWN
        SERVER <port>`` (Parser.java:543-585, parseShutdownServer) —
        accepted no-op shims: there is no single-node storage to
        checkpoint or TCP server to stop; snapshots are already durable
        on write (SCALE.md known-assumptions)."""
        m = re.match(
            r"SHUTDOWN(?:\s+(?P<mode>IMMEDIATELY|COMPACT|DEFRAG|SERVER\s+\d+))?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse SHUTDOWN: {s[:80]}")
        return self._ok(f"shutdown {(m.group('mode') or 'normal').lower()} (no-op)")

    def _checksum(self, s: str) -> DataFrame:
        """``CHECKSUM TABLE <name> [, <name> ...]`` — order-insensitive
        content digest per table (MySQL-compat surface).

        The digest is the sum of per-row xxhash64 over all columns,
        modulo 2^61-1 — commutative and associative, so it is identical
        for any row order, partitioning, or executor count, and two
        replicas/engines holding the same rows agree. One aggregation
        pass per table, map-side combined; at 100 TB this is the cheap
        anti-entropy check that replaces a sort-and-compare.
        """
        from pyspark.sql import functions as F

        m = re.match(
            rf"CHECKSUM\s+TABLE\s+(?P<names>{_IDENT}(?:\s*,\s*{_IDENT})*)\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse CHECKSUM: {s[:80]}")
        p61 = (1 << 61) - 1
        rows = []
        for name in [n.strip().lower() for n in m.group("names").split(",")]:
            df = self.spark.table(name)
            digest = (
                df.select(
                    F.xxhash64(*df.columns)
                    .bitwiseAND(F.lit(p61))
                    .cast("decimal(38,0)")  # exact sum, no long overflow
                    .alias("h")
                )
                .agg((F.sum("h") % p61).cast("long").alias("d"))
                .collect()[0]["d"]
            )
            rows.append((name, int(digest or 0)))
        return self.spark.createDataFrame(
            rows, "table_name string, checksum bigint"
        )

    def _optimize(self, s: str) -> DataFrame:
        """``OPTIMIZE <table> [COMPACT [MAX FILES n]] [ZORDER BY (c1,
        …)]`` — data-layout rewrite (extension; the reference's nearest
        concept is a BTree clustered index, one sort order per table —
        CreateIndex.java; the page-defragmentation analogue is
        CompactPlan.java).

        ``COMPACT [MAX FILES n]``: threshold-driven small-file
        compaction via SnapshotTable.compact — rewrites ONLY partitions
        whose data-file count exceeds ``n`` (default 8) to one file
        each, links the rest metadata-only; a no-op (no new snapshot)
        when nothing exceeds. The right verb for partitioned tables
        accreting CDC/insert files. Plain ``OPTIMIZE <table>`` keeps the
        legacy whole-table coalesce (~1/8th file count). With ZORDER:
        one range-shuffle on the interleaved key (operators/layout.py)
        so every output file covers a disjoint hyper-box of the
        clustered columns and parquet footer stats prune on ALL of them.
        """
        m = re.match(
            rf"OPTIMIZE\s+(?P<name>{_IDENT})"
            rf"(?:\s+(?P<compact>COMPACT)(?:\s+MAX\s+FILES\s+(?P<maxf>\d+))?)?"
            rf"(?:\s+ZORDER\s+BY\s*\((?P<cols>[^)]+)\))?\s*$",
            s,
            re.IGNORECASE,
        )
        if not m:
            raise ValueError(f"cannot parse OPTIMIZE: {s[:80]}")
        name = m.group("name").lower()
        st = self.catalog.table(name)
        if m.group("compact"):
            if m.group("cols"):
                raise ValueError(
                    "OPTIMIZE: COMPACT and ZORDER BY are separate layout "
                    "rewrites — run them as two statements"
                )
            max_files = int(m.group("maxf") or 8)
            before = st.version
            v = st.compact(max_files)
            self.catalog.refresh_view(name)
            what = "no partitions over threshold" if v == before else f"v{v}"
            return self._ok(
                f"optimized {name} compact max files {max_files} ({what})"
            )
        df = st.read()
        if m.group("cols"):
            from .operators.layout import cluster_by_zorder

            cols = [c.strip().lower() for c in m.group("cols").split(",")]
            nparts = max(1, int(self.spark.conf.get("spark.sql.shuffle.partitions")))
            df = cluster_by_zorder(df, cols, num_partitions=nparts)
            st.write(df)
            self.catalog.refresh_view(name)
            return self._ok(f"optimized {name} zorder by ({', '.join(cols)})")
        n_in = df.rdd.getNumPartitions()
        df = df.coalesce(max(1, n_in // 8))
        st.write(df)
        self.catalog.refresh_view(name)
        return self._ok(f"optimized {name} (compacted {n_in} files)")

    def _analyze(self, s: str) -> DataFrame:
        # ANALYZE → selectivity stats per column (Analyze.java semantics)
        m = re.match(rf"ANALYZE(?:\s+TABLE)?\s+(?P<name>{_IDENT})", s, re.IGNORECASE)
        if not m:
            return self._ok("analyzed")
        name = m.group("name").lower()
        df = self.catalog.table(name).read()
        total = df.count() or 1
        aggs = [
            F.round(100.0 * F.approx_count_distinct(c) / F.lit(total), 0)
            .cast("int")
            .alias(c)
            for c in df.columns
        ]
        return df.agg(*aggs)

    @staticmethod
    def _coerce(val: str):
        for cast in (int, float):
            try:
                return cast(val)
            except ValueError:
                continue
        if val.upper() in ("TRUE", "FALSE"):
            return val.upper() == "TRUE"
        return val

    @staticmethod
    def _split_top_level(s: str) -> list[str]:
        parts, depth, cur, in_str = [], 0, [], False
        for ch in s:
            if ch == "'":
                in_str = not in_str
            if not in_str:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                elif ch == "," and depth == 0:
                    parts.append("".join(cur))
                    cur = []
                    continue
            cur.append(ch)
        if cur:
            parts.append("".join(cur))
        return [p.strip() for p in parts if p.strip()]

    def _pk_of(self, name: str) -> list[str]:
        meta = self.catalog.indexes.get(f"__pk_{name}")
        if meta:
            return meta.columns
        # no declared PK: fall back to all columns (deterministic order)
        return [f.name for f in self.catalog.table(name).read().schema.fields]
