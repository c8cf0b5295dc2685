"""Per-file column statistics for the table sink's manifests — the
data-skipping half of a lakehouse format (Delta `stats`, Iceberg
`lower_bounds`/`upper_bounds`), built from parquet FOOTERS only.

Why footers: the writer just produced the file, so its footer min/max is
free (KB read, page-cache hot) — no second data scan. Footer bounds are
SOUND for pruning even when inexact: parquet-mr truncates long binary
stats with proper bound rounding (max's last byte incremented), and
pyarrow writes full values — in both cases ``stat_min <= v <= stat_max``
holds for every value ``v`` in the file, which is all pruning needs.

A file's manifest entry gains two fields:

* ``cols``: the file's top-level column names. A committed file that
  LACKS the predicate column entirely (written before a schema-drift
  batch added it) reads as all-null there, so any null-rejecting
  predicate on that column prunes the whole file — schema evolution
  makes skipping STRONGER, not weaker.
* ``stats``: ``{col: {"kind": k, "min": v, "max": v, "nulls": n}}`` for
  top-level primitive columns whose every row group carries usable
  stats. ``min``/``max`` are both None for an all-null column (still
  prunable). Columns with unusable footers (binary, nested, truncated
  away, NaN-polluted floats) simply have no entry — absent stats always
  means "keep the file".

Soundness corners handled explicitly:

* **NaN**: Spark orders NaN ABOVE every value, but parquet writers
  exclude NaN from min/max — so a file whose only ``x > lit`` matches
  are NaN rows would be wrongly pruned by its finite max. Any float
  column whose footer min/max contains NaN is dropped here, and
  ``can_match`` refuses max-based pruning (``>``, ``>=``) for float
  kinds entirely.
* **Type confusion**: stats carry a ``kind`` tag (num/bool/str/days/us);
  a predicate literal is converted through the SAME mapping, and a
  kind mismatch disables pruning instead of comparing unlike types.
* **Timestamps/dates**: normalized to integer epoch micros / days at
  both record and probe time — never serialized as strings, never
  compared through float seconds (the repo-wide integer-boundary rule).
"""

from __future__ import annotations

import datetime as _dt
import math

_EPOCH_DT = _dt.datetime(1970, 1, 1)
_EPOCH_DATE = _dt.date(1970, 1, 1)

OPS = ("=", "<", "<=", ">", ">=")


def nan_safe_write_statistics(t) -> bool | list[str]:
    """`write_statistics` argument that keeps a parquet file honest under
    Spark's NaN ordering. pyarrow EXCLUDES NaN from footer min/max, but
    Spark orders NaN above every double — so Spark's own row-group
    pushdown silently drops NaN rows from pyarrow-written files
    (measured: a [NaN, 3.0] file with footer max=3.0 returns nothing for
    ``x > 100`` with pushdown on, the NaN row with it off). Omitting
    stats for exactly the float columns that contain NaN removes the
    lying bound at the source: every engine then scans those files
    instead of mis-pruning them. Returns True (all stats) when no float
    column holds a NaN."""
    import pyarrow as pa
    import pyarrow.compute as pc

    bad = set()
    for i, f in enumerate(t.schema):
        if pa.types.is_floating(f.type):
            if pc.any(pc.is_nan(t.column(i))).as_py():
                bad.add(f.name)
    if not bad:
        return True
    return [f.name for f in t.schema if f.name not in bad]


def _ts_micros(v: _dt.datetime) -> int:
    if v.tzinfo is not None:
        v = v.astimezone(_dt.timezone.utc).replace(tzinfo=None)
    return (v - _EPOCH_DT) // _dt.timedelta(microseconds=1)


def _date_days(v: _dt.date) -> int:
    return (v - _EPOCH_DATE).days


def footer_meta(path: str) -> dict:
    """Read one parquet footer into a manifest-ready ``{"cols", "stats"}``
    dict. Never raises on odd files — any column it cannot certify is
    left out of ``stats`` (pruning degrades to "keep", never to wrong)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    fields = {f.name: f.type for f in pf.schema_arrow}
    cols = list(fields)

    def kind_of(t) -> tuple[str, bool] | None:
        # (kind tag, is_float) for stats-able primitives; None = skip
        if pa.types.is_boolean(t):
            return "bool", False
        if pa.types.is_integer(t):
            return "num", False
        if pa.types.is_floating(t):
            return "num", True
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return "str", False
        if pa.types.is_date(t):
            return "days", False
        if pa.types.is_timestamp(t):
            return "us", False
        return None

    def norm(v, kind):
        if kind == "us":
            return _ts_micros(v)
        if kind == "days":
            return _date_days(v)
        if kind == "bool":
            return bool(v)
        return v

    acc: dict[str, dict] = {}
    bad: set[str] = set()
    for rg_i in range(md.num_row_groups):
        rg = md.row_group(rg_i)
        for ci in range(rg.num_columns):
            c = rg.column(ci)
            name = c.path_in_schema
            if "." in name or name in bad or name not in fields:
                continue
            kf = kind_of(fields[name])
            if kf is None:
                continue
            kind, is_float = kf
            st = c.statistics
            n_rows = rg.num_rows
            if st is None or st.null_count is None:
                bad.add(name)
                continue
            nulls = st.null_count
            ent = acc.setdefault(
                name, {"kind": kind, "min": None, "max": None, "nulls": 0,
                       "float": is_float}
            )
            ent["nulls"] += nulls
            if nulls == n_rows:
                continue  # all-null row group contributes no bounds
            if not st.has_min_max:
                bad.add(name)
                continue
            lo, hi = norm(st.min, kind), norm(st.max, kind)
            if is_float and (
                (isinstance(lo, float) and math.isnan(lo))
                or (isinstance(hi, float) and math.isnan(hi))
            ):
                bad.add(name)
                continue
            ent["min"] = lo if ent["min"] is None else min(ent["min"], lo)
            ent["max"] = hi if ent["max"] is None else max(ent["max"], hi)
    for name in bad:
        acc.pop(name, None)
    for ent in acc.values():
        if not ent["float"]:
            ent.pop("float")
    return {"cols": cols, "stats": acc}


BLOOM_K = 5
BLOOM_MAX_BITS = 1 << 20  # ~171 KB base64 per (file, column) manifest cap


def _bloom_positions_py(value_str: str, m_bits: int, k: int) -> list[int]:
    """Python twin of operators/bloom.bloom_positions — same portable
    52-bit sha2 hash (sketches.kmv_hash), same affine transforms — so a
    manifest bloom built here is bit-compatible with the SQL/Spark
    construction (and cross-checked against bloom_build in tests)."""
    import hashlib

    from crdb_changefeed_publisher_spark.operators.bloom import (
        BLOOM_COEFFS, BLOOM_MOD, BLOOM_SEED,
    )

    h = int(hashlib.sha256(
        f"{BLOOM_SEED}:{value_str}".encode()).hexdigest()[:13], 16)
    return [((h * a + b) % BLOOM_MOD) % m_bits for a, b in BLOOM_COEFFS[:k]]


def bloom_words_py(value_strs, m_bits: int, k: int = BLOOM_K) -> list[int]:
    """Signed-int64 bloom words over canonical value strings (the same
    packing as operators/bloom.bloom_build)."""
    words = [0] * (m_bits // 64)
    for s in value_strs:
        for pos in _bloom_positions_py(s, m_bits, k):
            words[pos // 64] |= 1 << (pos % 64)
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_contains_py(words: list[int], m_bits: int, k: int, value_str: str) -> bool:
    for pos in _bloom_positions_py(value_str, m_bits, k):
        w = words[pos // 64]
        if w < 0:
            w += 1 << 64
        if not (w >> (pos % 64)) & 1:
            return False
    return True


def file_blooms(t, cols: list[str]) -> dict:
    """Per-file manifest blooms for point-lookup skipping: min/max bounds
    cannot prune equality probes on UNCLUSTERED high-cardinality columns
    (every file's range spans the domain), but a KB-sized bloom per file
    answers "might this file contain key X?" with zero false negatives —
    the Delta/parquet bloom-filter pattern lifted to the manifest so no
    data file is opened at all. Built from the Arrow table being written
    (string/integer columns only — the canonical value string matches
    Spark's cast-to-string), sized by bloom_m_bits_for on the DISTINCT
    count; columns whose filter would exceed the manifest cap are skipped
    (absent bloom = keep the file, never wrong). The per-unique sha2 loop
    is the build cost — opt-in via bloom_cols for exactly the columns
    worth a point-lookup index."""
    import base64
    import struct

    import pyarrow as pa
    import pyarrow.compute as pc

    from crdb_changefeed_publisher_spark.operators.bloom import bloom_m_bits_for

    out = {}
    names = {f.name: f.type for f in t.schema}
    for col in cols:
        typ = names.get(col)
        if typ is None:
            continue
        if not (pa.types.is_integer(typ) or pa.types.is_string(typ)
                or pa.types.is_large_string(typ)):
            continue
        uniq = [v for v in pc.unique(t.column(col)).to_pylist() if v is not None]
        if not uniq:
            continue
        # clamp at the manifest cap (2^20): an oversubscribed filter
        # degrades to more false positives (keep more files), never to a
        # wrong prune
        m_bits = bloom_m_bits_for(len(uniq), bits_per_key=10, hi=20)
        words = bloom_words_py((str(v) for v in uniq), m_bits, BLOOM_K)
        packed = struct.pack(f"<{len(words)}q", *words)
        out[col] = {
            "m": m_bits,
            "k": BLOOM_K,
            "kind": "num" if pa.types.is_integer(typ) else "str",
            "b64": base64.b64encode(packed).decode("ascii"),
        }
    return out


def _bloom_reject(entry: dict, col: str, lit) -> bool:
    """True when the file's manifest bloom PROVES `col = lit` matches no
    row. Only int/str literals (the kinds file_blooms indexes); missing
    bloom or kind mismatch never rejects."""
    import base64
    import struct

    b = (entry.get("blooms") or {}).get(col)
    if b is None:
        return False
    # the canonical probe string must come from the SAME kind the filter
    # was built over: Spark would cast '05' = intcol to 5, but str('05')
    # != str(5) — a cross-kind probe could wrongly prune, so it never does
    if isinstance(lit, bool) or not isinstance(lit, (int, str)):
        return False
    lit_kind = "num" if isinstance(lit, int) else "str"
    if lit_kind != b.get("kind"):
        return False
    words = list(struct.unpack(
        f"<{b['m'] // 64}q", base64.b64decode(b["b64"])))
    return not bloom_contains_py(words, b["m"], b["k"], str(lit))


def _literal_kind(lit) -> tuple[str, object] | None:
    """(kind tag, normalized literal) through the same mapping as
    footer_meta, or None for literals we never prune on."""
    if isinstance(lit, bool):
        return "bool", lit
    if isinstance(lit, (int, float)):
        if isinstance(lit, float) and math.isnan(lit):
            return None
        return "num", lit
    if isinstance(lit, str):
        return "str", lit
    if isinstance(lit, _dt.datetime):  # before date: datetime IS a date
        return "us", _ts_micros(lit)
    if isinstance(lit, _dt.date):
        return "days", _date_days(lit)
    return None


def can_match(entry: dict, col: str, op: str, lit) -> bool:
    """May this committed file contain a row satisfying ``col op lit``?
    False only when the manifest PROVES it cannot. ``entry`` is one
    manifest file dict; files from pre-stats manifests always match."""
    if op not in OPS:
        raise ValueError(f"unsupported op {op!r}; use one of {OPS}")
    cols = entry.get("cols")
    if cols is not None and col not in cols:
        return False  # column absent -> all null -> null-rejecting op fails
    if op == "=" and _bloom_reject(entry, col, lit):
        return False  # manifest bloom: zero false negatives by construction
    st = (entry.get("stats") or {}).get(col)
    if st is None:
        return True
    lk = _literal_kind(lit)
    if lk is None or lk[0] != st["kind"]:
        return True
    _, v = lk
    lo, hi = st["min"], st["max"]
    if lo is None and hi is None:
        n_rows = entry.get("n_rows")
        if n_rows is not None and st["nulls"] >= n_rows:
            return False  # provably all-null
        return True
    if st.get("float") and op in (">", ">="):
        return True  # NaN orders above every bound in Spark; max is not one
    if op == "=":
        return lo <= v <= hi
    if op == "<":
        return lo < v
    if op == "<=":
        return lo <= v
    if op == ">":
        return hi > v
    return hi >= v  # ">="


def prune(entries: list[dict], where: list[tuple]) -> tuple[list[dict], int]:
    """(surviving manifest entries, number skipped) for a conjunction of
    ``(col, op, literal)`` predicates."""
    kept = [
        e
        for e in entries
        if all(can_match(e, c, op, lit) for c, op, lit in where)
    ]
    return kept, len(entries) - len(kept)


def residual_condition(where: list[tuple]):
    """The same conjunction as a Spark Column — pruning is a superset
    filter, so the reader always re-applies the exact predicate."""
    from pyspark.sql import functions as F

    cond = None
    for col, op, lit in where:
        c = F.col(col)
        piece = {
            "=": c == lit, "<": c < lit, "<=": c <= lit,
            ">": c > lit, ">=": c >= lit,
        }[op]
        cond = piece if cond is None else cond & piece
    return cond


def check_constraints(t, constraints: list[tuple]) -> None:
    """Write-time CHECK constraints over the Arrow table a part writer is
    about to commit (the Delta CHECK-constraint boundary). Raises on the
    first violation — the task fails, the batch manifest is never
    published, and the table is untouched (partial part files are
    invisible orphans for vacuum): constraint enforcement composes with
    the manifest-commit atomicity instead of needing its own machinery.

    Forms (SQL CHECK semantics — null satisfies everything except
    not_null):

    * ``(col, "not_null")``
    * ``(col, "range", lo, hi)``   — inclusive, nulls pass
    * ``(col, "isin", values)``    — membership, nulls pass
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    names = {f.name for f in t.schema}
    for c in constraints:
        col, kind = c[0], c[1]
        if col not in names:
            if kind == "not_null":
                raise ValueError(
                    f"constraint {col} not_null: column missing from batch "
                    "(reads as all-null)")
            continue  # absent column is all-null: passes range/isin
        arr = t.column(col)
        if kind == "not_null":
            if arr.null_count:
                raise ValueError(
                    f"constraint {col} not_null violated by "
                    f"{arr.null_count} row(s)")
        elif kind == "range":
            lo, hi = c[2], c[3]
            vals = pc.drop_null(arr)
            if len(vals):
                mm = pc.min_max(vals).as_py()
                if mm["min"] < lo or mm["max"] > hi:
                    raise ValueError(
                        f"constraint {col} range [{lo}, {hi}] violated: "
                        f"observed [{mm['min']}, {mm['max']}]")
        elif kind == "isin":
            allowed = c[2]
            vals = pc.drop_null(arr)
            ok = pc.is_in(vals, value_set=pa.array(list(allowed)))
            n_bad = len(vals) - pc.sum(ok.cast("int64")).as_py() if len(vals) else 0
            if n_bad:
                raise ValueError(
                    f"constraint {col} isin violated by {n_bad} row(s)")
        else:
            raise ValueError(f"unknown constraint kind {kind!r}")
