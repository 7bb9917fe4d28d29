"""Null-aware predicate kernels for decode-time pushdown.

Capability parity with the reference's filter module
(/root/reference/src/filters/):

* ``RangePredicate`` — integer/float range with open/closed bounds,
  mirroring ``IntegerRangeFilter`` (integer_range_filter.rs:24-170)
  and ``FloatPointRangeFilter`` (float_point_range_filter.rs:23-231).
* ``BooleanPredicate`` — boolean_filter.rs:21-75.
* ``ConstPredicate`` — const_filter.rs:21-135.
* Null semantics — fixed_length_filter.rs:20-165:
  ``keep = (valid & check(value)) | (null_allowed & ~valid)``.
* ``check_range(min, max, has_null)`` — the zone-map interface
  (fixed_length_filter.rs:91-114); the reference defines it but never
  wires it into readers — our decode path actually uses it to skip
  whole blocks.
* Dictionary-level evaluation — evaluate once per distinct value then
  map over codes (dictionary_page_int32_with_filters.rs:97-177); we
  additionally support byte-array dictionaries, which the reference
  leaves NotYetImplemented (primitive_column_reader.rs:425-427).

numpy boolean masks are our selection vectors (row_range_set.rs
builds explicit ranges for the same purpose).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass

import numpy as np

ALL = "all"
NONE = "none"
SOME = "some"


class Predicate:
    """Base: vectorized mask over dense values + zone-map check."""

    column: str
    null_allowed: bool = False

    def check(self, values: np.ndarray) -> np.ndarray:  # dense, no nulls
        raise NotImplementedError

    def check_range(self, vmin, vmax, has_null: bool) -> str:
        """Zone-map: 'all' / 'none' / 'some' rows in [vmin, vmax] survive."""
        return SOME

    def check_zone(self, stats: dict) -> str:
        """Dispatch the block's zone-map stats row to ``check_range``.
        Byte predicates override this to use the stored min/max prefixes
        (the reference defines check_range but never wires it into a
        reader — fixed_length_filter.rs:91-114; we call it before ever
        touching payload bytes)."""
        return self.check_range(
            stats.get("vmin"), stats.get("vmax"), stats.get("has_null", False)
        )

    def mask(self, values: np.ndarray, validity: np.ndarray | None) -> np.ndarray:
        """Full-length keep mask with the reference's ternary-null rule."""
        if validity is None:
            return self.check(values)
        keep = np.zeros(len(validity), dtype=bool)
        keep[validity] = self.check(values)
        if self.null_allowed:
            keep |= ~validity
        return keep

    def jvm_zone_keep(self, st):
        """Optional JVM-side zone prefilter: a Column over the typed
        stats struct ``st`` that is False only for groups this predicate
        can PROVABLY never match (conservative: null stats pass, Python
        re-checks everything that remains).  None = no JVM prefilter."""
        return None

    def dict_mask(self, uniques, codes: np.ndarray,
                  validity: np.ndarray | None) -> np.ndarray:
        """Dictionary fast path: predicate on distincts, gather by code."""
        if hasattr(uniques, "offsets"):  # StringColumn
            umask = self.check_bytes(uniques)
        else:
            umask = self.check(uniques)
        dense = umask[codes]
        if validity is None:
            return dense
        keep = np.zeros(len(validity), dtype=bool)
        keep[validity] = dense
        if self.null_allowed:
            keep |= ~validity
        return keep

    def check_bytes(self, uniques) -> np.ndarray:
        raise TypeError(f"{type(self).__name__} does not apply to byte arrays")

    @property
    def columns(self) -> list[str]:
        """Every leaf column this predicate reads (composites: several)."""
        return [self.column]

    def map_leaves(self, fn):
        """Rebuild with ``fn`` applied to every column-bearing leaf —
        used to resolve dotted struct paths to flat leaf names."""
        return fn(self)

    def jvm_zone_keep_cols(self, st_for):
        """``jvm_zone_keep`` generalized to composites: ``st_for(col)``
        yields the typed stats struct Column for any leaf column."""
        return self.jvm_zone_keep(st_for(self.column))


def pred_columns(predicates) -> list[str]:
    """Ordered dedup of every leaf column a predicate list touches
    (composite predicates span several columns)."""
    out: list[str] = []
    for p in predicates:
        for c in p.columns:
            if c not in out:
                out.append(c)
    return out


def _utc(v):
    """Naive datetime -> UTC-aware (the predicate's documented naive-
    datetime convention, applied identically on the storage side and
    the Spark-literal side so engine/Catalyst parity holds on non-UTC
    hosts)."""
    import datetime as dt

    return v.replace(tzinfo=dt.timezone.utc) if v.tzinfo is None else v


def _storage_bound(v):
    """Temporal bound -> the column's storage integer (timestamps ride
    as epoch MICROSECONDS, dates as epoch DAYS — schema.storage_cast).
    Naive datetimes are treated as UTC.  Non-temporal bounds pass
    through.  Integer timedelta division, NOT timestamp()*1e6: the
    float path is off by 1 us for ~1% of microsecond-precision
    stamps."""
    import datetime as dt

    if isinstance(v, dt.datetime):  # before date: datetime IS a date
        epoch = dt.datetime(1970, 1, 1, tzinfo=dt.timezone.utc)
        return (_utc(v) - epoch) // dt.timedelta(microseconds=1)
    if isinstance(v, dt.date):
        return (v - dt.date(1970, 1, 1)).days
    return v


def _spark_bound(v):
    """The bound as handed to Spark in to_spark_condition: naive
    datetimes get the same UTC interpretation _storage_bound applies
    (Spark would otherwise read a naive literal in the SESSION
    timezone and parity would silently break off-UTC)."""
    import datetime as dt

    return _utc(v) if isinstance(v, dt.datetime) else v


@dataclass
class RangePredicate(Predicate):
    """lower <(=) value <(=) upper; None bound = unbounded.  Bounds may
    be datetime/date objects for timestamp/date columns — they
    normalize to the storage epoch integers at construction.

    integer_range_filter.rs clamps i128 bounds per physical type and
    short-circuits always-false ranges; numpy comparison semantics give
    us the same result without the clamping dance.
    """

    column: str
    lower: float | int | None = None
    upper: float | int | None = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    null_allowed: bool = False

    def __post_init__(self):
        # keep the user's values for to_spark_condition (Spark compares
        # timestamp columns against datetime literals, not epoch ints)
        self._spark_lower = self.lower
        self._spark_upper = self.upper
        self.lower = _storage_bound(self.lower)
        self.upper = _storage_bound(self.upper)

    def check(self, values: np.ndarray) -> np.ndarray:
        keep = np.ones(len(values), dtype=bool)
        if self.lower is not None:
            keep &= (values >= self.lower) if self.lower_inclusive else (values > self.lower)
        if self.upper is not None:
            keep &= (values <= self.upper) if self.upper_inclusive else (values < self.upper)
        return keep

    def check_range(self, vmin, vmax, has_null: bool) -> str:
        if vmin is None or vmax is None:
            return SOME
        test = self.check(np.array([vmin, vmax]))
        lo_in, hi_in = bool(test[0]), bool(test[1])
        if lo_in and hi_in:
            # whole zone inside the range only if range covers [vmin, vmax]
            return ALL if not has_null or self.null_allowed else SOME
        if not lo_in and not hi_in:
            # zone may still straddle the range interior
            below = self.upper is not None and vmin > self.upper
            above = self.lower is not None and vmax < self.lower
            if (below or above) and not (has_null and self.null_allowed):
                return NONE
        return SOME

    def to_spark_condition(self):
        """Equivalent Column expression — for parity tests vs Catalyst."""
        from pyspark.sql import functions as F

        c = F.col(self.column)
        lo = _spark_bound(getattr(self, "_spark_lower", self.lower))
        hi = _spark_bound(getattr(self, "_spark_upper", self.upper))
        cond = F.lit(True)
        if lo is not None:
            cond = cond & ((c >= lo) if self.lower_inclusive else (c > lo))
        if hi is not None:
            cond = cond & ((c <= hi) if self.upper_inclusive else (c < hi))
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond

    def jvm_zone_keep(self, st):
        from pyspark.sql import functions as F

        if self.lower is None and self.upper is None:
            return None
        keep = F.lit(True)
        if self.lower is not None:
            keep = keep & (st.getField("vmax").isNull()
                           | (st.getField("vmax") >= float(self.lower)))
        if self.upper is not None:
            keep = keep & (st.getField("vmin").isNull()
                           | (st.getField("vmin") <= float(self.upper)))
        if self.null_allowed:
            keep = keep | F.coalesce(st.getField("has_null"), F.lit(True))
        return keep


def _split128(x: int) -> tuple[int, int]:
    """Signed int (|x| < 2^127) -> (lo u64, hi i64) two's-complement
    word pair — the d128 storage layout."""
    lo = x & 0xFFFFFFFFFFFFFFFF
    hi = x >> 64  # arithmetic shift: sign-extends for negatives
    if not -(1 << 63) <= hi < (1 << 63):
        raise OverflowError(f"{x} does not fit in 128 bits")
    return lo, hi


@dataclass
class Decimal128RangePredicate(Predicate):
    """Range filter over decimal(19..38) columns by UNSCALED int bounds
    (the reference rejects decimals outright; p<=18 columns use plain
    ``RangePredicate`` on their unscaled int64 storage).  Values arrive
    as (n, 2) int64 (lo, hi) word pairs; comparison is signed-128
    lexicographic — hi words signed, tie-broken on lo words unsigned.
    Bounds are Python ints of the UNSCALED value (e.g. decimal(38,4)
    value 12.5 -> 125000), which may exceed 64 bits.

    d128 blocks carry no zone-map bounds (the stats slot is float64),
    so every block decodes its predicate column — correct, just never
    skipped; cluster + store at p<=18 when zone pruning matters."""

    column: str
    lower: int | None = None
    upper: int | None = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    null_allowed: bool = False
    supports_d128 = True  # decode's guard admits this predicate class

    def check(self, values: np.ndarray) -> np.ndarray:
        v = np.ascontiguousarray(values, dtype=np.int64)
        if v.ndim == 1:
            # precision-widened tables mix storages: runs written at
            # p<=18 store 1-D unscaled int64 — sign-extend to word
            # pairs so ONE predicate class filters the whole column
            pairs = np.empty((len(v), 2), dtype=np.int64)
            pairs[:, 0] = v
            pairs[:, 1] = v >> 63
            v = pairs
        else:
            v = v.reshape(-1, 2)
        lo_u = v[:, 0].view(np.uint64)
        hi = v[:, 1]
        keep = np.ones(len(v), dtype=bool)
        if self.lower is not None:
            b_lo, b_hi = _split128(int(self.lower))
            tie = hi == b_hi
            cmp = (lo_u >= np.uint64(b_lo)) if self.lower_inclusive \
                else (lo_u > np.uint64(b_lo))
            keep &= (hi > b_hi) | (tie & cmp)
        if self.upper is not None:
            b_lo, b_hi = _split128(int(self.upper))
            tie = hi == b_hi
            cmp = (lo_u <= np.uint64(b_lo)) if self.upper_inclusive \
                else (lo_u < np.uint64(b_lo))
            keep &= (hi < b_hi) | (tie & cmp)
        return keep


@dataclass
class BooleanPredicate(Predicate):
    column: str
    value: bool = True
    null_allowed: bool = False

    def check(self, values: np.ndarray) -> np.ndarray:
        return values == self.value

    def check_range(self, vmin, vmax, has_null: bool) -> str:
        if vmin is None or vmax is None:
            return SOME
        if vmin == vmax:
            hit = bool(vmin) == self.value
            if hit and not has_null:
                return ALL
            if not hit and not (has_null and self.null_allowed):
                return NONE
        return SOME


@dataclass
class ConstPredicate(Predicate):
    """Accept-all / reject-all (const_filter.rs)."""

    column: str
    accept: bool = True
    null_allowed: bool = False
    # value-independent: works over d128 word pairs too (len((n,2)) = n),
    # so pushed IS [NOT] NULL on decimal(>18) columns must not trip the
    # decode guard — Catalyst auto-generates IsNotNull beside every
    # comparison filter, so this reaches d128 columns routinely via DSv2
    supports_d128 = True

    def check(self, values: np.ndarray) -> np.ndarray:
        return np.full(len(values), self.accept, dtype=bool)

    def check_bytes(self, col) -> np.ndarray:
        # value-independent: applies to any physical type (accept=True,
        # null_allowed=False is the universal IS NOT NULL predicate)
        return np.full(len(col), self.accept, dtype=bool)

    def check_range(self, vmin, vmax, has_null: bool) -> str:
        if self.accept:
            return ALL if not has_null or self.null_allowed else SOME
        return SOME if (has_null and self.null_allowed) else NONE


def _jvm_bytes_not_above(v, st):
    """JVM keep-leg: NOT (v[:len(vmax_pfx)] > vmax_pfx), sharpened to
    v > vmax_pfx when the stored max is exact.  Uses the identity
    v[:len(p)] > p  ⟺  v > p AND NOT startswith(v, p), which avoids a
    per-row-length substring."""
    from pyspark.sql import functions as F

    pmax = st.getField("vmax_pfx")
    exact = F.coalesce(st.getField("vmax_exact"), F.lit(False))
    above = F.when(exact, v > pmax).otherwise((v > pmax) & ~v.startswith(pmax))
    return pmax.isNull() | ~above


def _jvm_bytes_not_below_eq(v, st):
    """JVM keep-leg for equality needles: NOT (v < vmin_pfx); prefix <=
    full value, so v < vmin_pfx implies v < vmin."""
    pmin = st.getField("vmin_pfx")
    return pmin.isNull() | (v >= pmin)


def _bytes_zone_bounds(stats: dict):
    """Read the byte-column zone-map stats written by the encoder:
    (vmin_pfx, vmax_pfx, vmin_exact, vmax_exact, has_null) or None.
    ``*_pfx`` are the first 24 bytes of the true min/max; ``*_exact``
    says the value fit entirely (so the prefix IS the bound)."""
    pmin, pmax = stats.get("vmin_pfx"), stats.get("vmax_pfx")
    if pmin is None or pmax is None:
        return None
    return (bytes(pmin), bytes(pmax),
            bool(stats.get("vmin_exact") or False),
            bool(stats.get("vmax_exact") or False),
            bool(stats.get("has_null") or False))


@dataclass
class BytesEqPredicate(Predicate):
    """Byte-array equality — the canonical dictionary-pushdown predicate
    (lang = 'py'): evaluated once against the sorted dictionary, O(1)
    per row afterwards (dictionary_page_*_with_filters.rs made real for
    byte arrays)."""

    column: str
    value: bytes = b""
    null_allowed: bool = False

    def check(self, values) -> np.ndarray:
        return self.check_bytes(values)

    def check_zone(self, stats: dict) -> str:
        z = _bytes_zone_bounds(stats)
        if z is None:
            return SOME
        vmin_pfx, vmax_pfx, vmin_exact, vmax_exact, has_null = z
        v = self.value
        # below the zone: v < vmin_pfx implies v < vmin (prefix <= full);
        # above the zone: v's own prefix > vmax_pfx implies v > any value
        # sharing that prefix (exact bound sharpens the comparison)
        below = v < vmin_pfx
        above = v > vmax_pfx if vmax_exact else v[: len(vmax_pfx)] > vmax_pfx
        nulls_keep = has_null and self.null_allowed
        if (below or above) and not nulls_keep:
            return NONE
        if (vmin_exact and vmax_exact and vmin_pfx == vmax_pfx == v
                and (not has_null or self.null_allowed)):
            return ALL
        # equality bloom (parquet-bloom analog): a miss is a certain skip
        bl = stats.get("bloom")
        if bl is not None and not nulls_keep and not below and not above:
            from ..kernels import bloom

            if not bloom.maybe_contains(bytes(bl), v):
                return NONE
        return SOME

    def check_bytes(self, col) -> np.ndarray:
        from ..kernels.strings import StringColumn

        assert isinstance(col, StringColumn)
        vlen = len(self.value)
        out = col.lengths() == vlen
        if vlen:
            idx = np.nonzero(out)[0]
            pv = np.frombuffer(self.value, dtype=np.uint8)
            src = np.frombuffer(col.data, dtype=np.uint8)
            starts = col.offsets[idx]
            ok = np.ones(len(idx), dtype=bool)
            for k in range(vlen):
                ok &= src[starts + k] == pv[k]
            out[idx] = ok
        return out

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        cond = c == self.value.decode("utf-8")
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond

    def jvm_zone_keep(self, st):
        from pyspark.sql import functions as F

        v = F.lit(self.value)
        keep = _jvm_bytes_not_below_eq(v, st) & _jvm_bytes_not_above(v, st)
        if self.null_allowed:
            keep = keep | F.coalesce(st.getField("has_null"), F.lit(True))
        return keep


@dataclass
class InPredicate(Predicate):
    """value IN (set) for any physical type — the dictionary-pushdown
    workhorse (evaluated once per distinct value), zone-checked against
    min/max bounds and, for byte columns, the per-block bloom filter
    (every needle missing the bloom => whole block skipped)."""

    column: str
    values: tuple = ()
    null_allowed: bool = False

    def _byte_values(self) -> list[bytes]:
        return [v if isinstance(v, bytes) else str(v).encode()
                for v in self.values]

    def check(self, values) -> np.ndarray:
        if hasattr(values, "offsets"):
            return self.check_bytes(values)
        if not self.values:
            return np.zeros(len(values), dtype=bool)
        return np.isin(values, np.asarray(list(self.values)))

    def check_bytes(self, col) -> np.ndarray:
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..kernels.strings import to_arrow

        if not self.values:
            return np.zeros(len(col), dtype=bool)
        vals = pa.array(self._byte_values(), pa.large_binary())
        return np.asarray(pc.is_in(to_arrow(col), value_set=vals))

    def check_zone(self, stats: dict) -> str:
        nulls_keep = stats.get("has_null", False) and self.null_allowed
        if not self.values:
            return SOME if nulls_keep else NONE
        z = _bytes_zone_bounds(stats)
        if z is not None:
            vmin_pfx, vmax_pfx, vmin_exact, vmax_exact, _ = z
            bl = stats.get("bloom")

            def possible(v: bytes) -> bool:
                below = v < vmin_pfx
                above = v > vmax_pfx if vmax_exact else v[: len(vmax_pfx)] > vmax_pfx
                if below or above:
                    return False
                if bl is not None:
                    from ..kernels import bloom

                    return bloom.maybe_contains(bytes(bl), v)
                return True

            if not nulls_keep and not any(possible(v) for v in self._byte_values()):
                return NONE
            return SOME
        vmin, vmax = stats.get("vmin"), stats.get("vmax")
        if vmin is None or vmax is None:
            return SOME
        try:
            if not nulls_keep and all(v < vmin or v > vmax for v in self.values):
                return NONE
        except TypeError:
            return SOME
        return SOME

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        vals = [v.decode("utf-8") if isinstance(v, bytes) else v
                for v in self.values]
        cond = c.isin(vals)
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond

    def jvm_zone_keep(self, st):
        from pyspark.sql import functions as F

        if not self.values or len(self.values) > 16:
            return None  # big needle sets: not worth the expression tree
        if all(isinstance(v, (bytes, str)) for v in self.values):
            legs = [
                _jvm_bytes_not_below_eq(F.lit(v), st)
                & _jvm_bytes_not_above(F.lit(v), st)
                for v in self._byte_values()
            ]
        elif all(isinstance(v, (int, float)) and not isinstance(v, bool)
                 for v in self.values):
            legs = [
                (st.getField("vmax").isNull() | (st.getField("vmax") >= float(v)))
                & (st.getField("vmin").isNull() | (st.getField("vmin") <= float(v)))
                for v in self.values
            ]
        else:
            return None
        keep = legs[0]
        for leg in legs[1:]:
            keep = keep | leg
        if self.null_allowed:
            keep = keep | F.coalesce(st.getField("has_null"), F.lit(True))
        return keep


@dataclass
class ArrayContainsPredicate(Predicate):
    """value IN list-column row — the membership filter for encoded
    array columns (array<string> tag lists, array<fixed> features).
    Null ELEMENTS never match; a null ROW follows the ternary
    null_allowed rule like every other predicate.  No zone maps exist
    for list columns, so the block always opens (verdict 'some')."""

    column: str
    value: object = None
    null_allowed: bool = False

    def check(self, col) -> np.ndarray:
        # col is a dense ListColumn (null rows already stripped)
        vals = col.values
        if hasattr(vals, "offsets"):  # byte elements
            v = self.value if isinstance(self.value, bytes) \
                else str(self.value).encode()
            hits = BytesEqPredicate(column=self.column, value=v).check_bytes(vals)
        else:
            hits = np.asarray(vals) == self.value
        ev = col.elem_validity
        if ev is not None:
            slot_hits = np.zeros(len(ev), dtype=bool)
            slot_hits[ev] = hits
            hits = slot_hits
        # per-row ANY over the slot ranges (running count sampled at the
        # row offsets — handles empty rows for free)
        cz = np.zeros(len(hits) + 1, dtype=np.int64)
        np.cumsum(hits, out=cz[1:])
        return (cz[col.offsets[1:]] - cz[col.offsets[:-1]]) > 0

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        v = self.value.decode("utf-8") if isinstance(self.value, bytes) \
            else self.value
        cond = F.array_contains(c, v)
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond


@dataclass
class BytesPrefixPredicate(Predicate):
    """Byte-array predicate: value starts with ``prefix`` — exercises the
    byte-array dictionary filter path the reference left unimplemented."""

    column: str
    prefix: bytes = b""
    null_allowed: bool = False

    def check(self, values) -> np.ndarray:
        return self.check_bytes(values)

    def check_zone(self, stats: dict) -> str:
        z = _bytes_zone_bounds(stats)
        if z is None:
            return SOME
        vmin_pfx, vmax_pfx, vmin_exact, vmax_exact, has_null = z
        p = self.prefix
        # any match is >= p, so p > vmax means NONE; vmin already past
        # the prefix's cover (vmin[:len(p)] > p) also means NONE.  The
        # prefix comparisons are only conclusive while p fits inside the
        # stored 24-byte prefixes.
        above = p > vmax_pfx if vmax_exact else p[: len(vmax_pfx)] > vmax_pfx
        below = vmin_pfx[: len(p)] > p if len(p) <= len(vmin_pfx) or vmin_exact else False
        if (above or below) and not (has_null and self.null_allowed):
            return NONE
        # both bounds start with p => every value in [vmin, vmax] does
        if (len(p) <= min(len(vmin_pfx), len(vmax_pfx))
                and vmin_pfx[: len(p)] == p == vmax_pfx[: len(p)]
                and (not has_null or self.null_allowed)):
            return ALL
        return SOME

    def check_bytes(self, col) -> np.ndarray:
        from ..kernels.strings import StringColumn

        assert isinstance(col, StringColumn)
        plen = len(self.prefix)
        out = col.lengths() >= plen
        if plen:
            idx = np.nonzero(out)[0]
            pv = np.frombuffer(self.prefix, dtype=np.uint8).astype(np.uint64)
            src = np.frombuffer(col.data, dtype=np.uint8)
            starts = col.offsets[idx]
            ok = np.ones(len(idx), dtype=bool)
            for k in range(plen):
                ok &= src[starts + k] == pv[k]
            out[idx] = ok
        return out

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        cond = c.startswith(self.prefix.decode("utf-8"))
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond

    def jvm_zone_keep(self, st):
        from pyspark.sql import functions as F

        if not self.prefix:
            return None
        p = F.lit(self.prefix)
        pmin = st.getField("vmin_pfx")
        # below leg is conclusive only while the stored prefix covers the
        # needle (or the stored min is exact) — check_zone mirrors this
        conclusive = ((F.octet_length(pmin) >= len(self.prefix))
                      | F.coalesce(st.getField("vmin_exact"), F.lit(False)))
        below = conclusive & (F.substring(pmin, 1, len(self.prefix)) > p)
        keep = (pmin.isNull() | ~below) & _jvm_bytes_not_above(p, st)
        if self.null_allowed:
            keep = keep | F.coalesce(st.getField("has_null"), F.lit(True))
        return keep

@dataclass
class BytesContainsPredicate(Predicate):
    """Byte-array predicate: value contains ``needle`` (SQL LIKE
    '%needle%'), byte-level.  Substring has no order relation so zone
    min/max prefixes can never prune — ``check_zone`` stays SOME — but
    the dictionary path still evaluates the scan once per DISTINCT
    value and maps over codes (the filter-over-dictionary strategy of
    dictionary_page_int32_with_filters.rs:97-177, applied to the
    byte-array dictionaries the reference leaves NotYetImplemented)."""

    column: str
    needle: bytes = b""
    null_allowed: bool = False

    def check(self, values) -> np.ndarray:
        return self.check_bytes(values)

    def check_bytes(self, col) -> np.ndarray:
        import pyarrow.compute as pc

        from ..kernels import strings

        if not self.needle:
            return np.ones(len(col), dtype=bool)
        got = pc.match_substring(strings.to_arrow(col), self.needle)
        return np.asarray(got, dtype=bool)

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        try:
            needle = self.needle.decode("utf-8")
        except UnicodeDecodeError:  # binary column: bytes literal
            needle = F.lit(self.needle)
        cond = c.contains(needle)
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond


@dataclass
class BytesSuffixPredicate(Predicate):
    """Byte-array predicate: value ends with ``suffix`` (SQL LIKE
    '%suffix') — the file-extension filter shape.  Like contains, no
    order relation (suffixes don't sort with the values), so no zone
    pruning; dictionary blocks evaluate once per distinct value."""

    column: str
    suffix: bytes = b""
    null_allowed: bool = False

    def check(self, values) -> np.ndarray:
        return self.check_bytes(values)

    def check_bytes(self, col) -> np.ndarray:
        import pyarrow.compute as pc

        from ..kernels import strings

        if not self.suffix:
            return np.ones(len(col), dtype=bool)
        got = pc.ends_with(strings.to_arrow(col), pattern=self.suffix)
        return np.asarray(got, dtype=bool)

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        try:
            suffix = self.suffix.decode("utf-8")
        except UnicodeDecodeError:  # binary column: bytes literal
            suffix = F.lit(self.suffix)
        cond = c.endswith(suffix)
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond


def replace_predicate(pred, **kw):
    """``dataclasses.replace`` that PRESERVES construction-time hints
    (RangePredicate keeps the user's original temporal bounds in
    ``_spark_lower``/``_spark_upper`` for to_spark_condition; a plain
    replace re-runs __post_init__ on the already-converted epoch ints
    and would clobber them).  Use this for every predicate rebuild —
    leaf-column resolution, NOT's null_allowed strip."""
    new = dataclasses.replace(pred, **kw)
    for a in ("_spark_lower", "_spark_upper"):
        if hasattr(pred, a):
            setattr(new, a, getattr(pred, a))
    return new


class _CompositePredicate(Predicate):
    """Shared plumbing for OR/AND nodes (subclasses declare the
    ``children`` dataclass field; its presence is how the engine
    detects composites).  Evaluation is recursive
    (decode.eval_group_predicate), so every leaf keeps its zone-map /
    bloom / dictionary short-circuits; the single-column Predicate API
    (check/mask/check_zone) is deliberately unimplemented here."""

    @property
    def columns(self) -> list[str]:
        out: list[str] = []
        for ch in self.children:
            for c in ch.columns:
                if c not in out:
                    out.append(c)
        return out

    def map_leaves(self, fn):
        return dataclasses.replace(
            self, children=[ch.map_leaves(fn) for ch in self.children])


@dataclass
class OrPredicate(_CompositePredicate):
    """SQL disjunction — keep a row iff ANY child keeps it.  Children
    may sit on DIFFERENT columns (``WHERE a < 5 OR b = 'x'``), the one
    shape the conjunctive predicate-list cascade cannot express.  SQL
    ternary semantics come free: each child's mask is exactly its
    rows-that-evaluate-TRUE set (nulls enter only via that child's own
    null_allowed), and OR keeps a row iff some disjunct is TRUE.

    Scale shape: a group is skipped unopened only when EVERY child's
    zone says 'none' (the JVM prefilter is the same union, so a group
    provably dead on all disjuncts never crosses into Python)."""

    children: list

    combine = "or"

    def __post_init__(self):
        if not self.children:
            raise ValueError("OrPredicate needs at least one child")

    def jvm_zone_keep_cols(self, st_for):
        keeps = []
        for ch in self.children:
            k = ch.jvm_zone_keep_cols(st_for)
            if k is None:
                return None  # one child can never prune -> the union can't
            keeps.append(k)
        out = keeps[0]
        for k in keeps[1:]:
            out = out | k
        return out

    def to_spark_condition(self):
        out = self.children[0].to_spark_condition()
        for ch in self.children[1:]:
            out = out | ch.to_spark_condition()
        return out


@dataclass
class AndPredicate(_CompositePredicate):
    """SQL conjunction as a predicate VALUE.  Top-level AND is spelled
    as a plain predicate list; this class exists so conjunctions can
    nest inside OrPredicate: ``(a < 5 AND b = 'x') OR c > 9``."""

    children: list

    combine = "and"

    def __post_init__(self):
        if not self.children:
            raise ValueError("AndPredicate needs at least one child")

    def jvm_zone_keep_cols(self, st_for):
        keeps = [k for k in (ch.jvm_zone_keep_cols(st_for)
                             for ch in self.children) if k is not None]
        if not keeps:
            return None
        out = keeps[0]
        for k in keeps[1:]:
            out = out & k
        return out

    def to_spark_condition(self):
        out = self.children[0].to_spark_condition()
        for ch in self.children[1:]:
            out = out & ch.to_spark_condition()
        return out


@dataclass
class NotPredicate(Predicate):
    """SQL NOT over a single-column leaf predicate — the engine's
    ``!=``, NOT LIKE, NOT IN.  Ternary rule: NOT(NULL) is NULL, so null
    rows are dropped unless this predicate's own ``null_allowed``.

    Zone verdicts invert EXACTLY: the child's value-domain verdict is
    computed with nulls set aside (a null_allowed=False copy), then
    nulls re-enter under this predicate's null_allowed — so NOT still
    skips blocks unopened (``NOT x = 'a'`` skips a block whose zone
    proves every value is 'a', and accepts whole blocks whose zone or
    bloom proves 'a' absent).  Composite children are rejected — apply
    De Morgan and push NOT to the leaves."""

    child: Predicate
    null_allowed: bool = False

    def __post_init__(self):
        if getattr(self.child, "children", None) is not None:
            raise TypeError("NotPredicate wraps a single-column leaf "
                            "predicate; push NOT to the leaves "
                            "(De Morgan) instead")
        if isinstance(self.child, NotPredicate):
            raise TypeError("NOT NOT p: use p.child directly")
        self.column = self.child.column
        self.supports_d128 = getattr(self.child, "supports_d128", False)
        # the child's VALUE verdicts with nulls set aside — its own
        # null_allowed must not leak into the inversion
        # (replace_predicate keeps _spark_* temporal-literal hints)
        self._vchild = (self.child if not self.child.null_allowed
                        else replace_predicate(self.child,
                                               null_allowed=False))

    def map_leaves(self, fn):
        return dataclasses.replace(self, child=fn(self.child))

    def check(self, values) -> np.ndarray:
        return ~self._vchild.check(values)

    def check_bytes(self, col) -> np.ndarray:
        return ~self._vchild.check_bytes(col)

    def check_zone(self, stats: dict) -> str:
        v = self._vchild.check_zone(stats)
        has_null = bool(stats.get("has_null", False))
        if v == ALL:   # every valid value passes the child -> none pass NOT
            return SOME if (has_null and self.null_allowed) else NONE
        if v == NONE:  # no valid value passes the child -> all valid pass
            return ALL if (not has_null or self.null_allowed) else SOME
        return SOME

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)
        cond = (~self._vchild.to_spark_condition()) & c.isNotNull()
        if self.null_allowed:
            cond = cond | c.isNull()
        return cond


@dataclass
class BytesRangePredicate(Predicate):
    """Lexicographic byte-array range: lower <(=) value <(=) upper —
    the SQL ``path >= 'a/' AND path < 'b/'`` prefix-partition range
    scan.  str bounds are encoded UTF-8 at construction.

    Zone semantics over the stored 24-byte min/max prefixes (prefix <=
    full value; ``*_exact`` = the prefix IS the bound):

    * provably BELOW the range (all values < lower): lower's own
      prefix sorts above vmax_pfx (then lower > any value sharing that
      prefix), or the max is exact and < lower;
    * provably ABOVE the range (all values > upper): vmin_pfx > upper
      (v >= vmin_pfx regardless of exactness);
    * whole block INSIDE only when both stored bounds prove it
      (vmin_pfx >= lower; max side needs exactness or a prefix
      strictly below upper).

    Dictionary blocks evaluate once per distinct; the dense path is a
    vectorized Arrow binary compare.  DSv2 pushes string
    GreaterThan[OrEqual]/LessThan[OrEqual] here."""

    column: str
    lower: bytes | None = None
    upper: bytes | None = None
    lower_inclusive: bool = True
    upper_inclusive: bool = True
    null_allowed: bool = False

    def __post_init__(self):
        if isinstance(self.lower, str):
            self.lower = self.lower.encode()
        if isinstance(self.upper, str):
            self.upper = self.upper.encode()
        if self.lower is None and self.upper is None:
            raise ValueError("BytesRangePredicate needs a bound")

    def check(self, values) -> np.ndarray:
        return self.check_bytes(values)

    def check_bytes(self, col) -> np.ndarray:
        import pyarrow as pa
        import pyarrow.compute as pc

        from ..kernels import strings

        arr = strings.to_arrow(col)
        keep = np.ones(len(arr), dtype=bool)
        if self.lower is not None:
            op = pc.greater_equal if self.lower_inclusive else pc.greater
            keep &= np.asarray(op(arr, pa.scalar(self.lower, arr.type)),
                               dtype=bool)
        if self.upper is not None:
            op = pc.less_equal if self.upper_inclusive else pc.less
            keep &= np.asarray(op(arr, pa.scalar(self.upper, arr.type)),
                               dtype=bool)
        return keep

    def check_zone(self, stats: dict) -> str:
        z = _bytes_zone_bounds(stats)
        if z is None:
            return SOME
        vmin_pfx, vmax_pfx, vmin_exact, vmax_exact, has_null = z
        nulls_keep = has_null and self.null_allowed
        below = above = False
        if self.lower is not None:
            # all values < lower?  v <= max; max starts with vmax_pfx
            lo = self.lower
            below = lo[: len(vmax_pfx)] > vmax_pfx or (
                vmax_exact and (vmax_pfx < lo if self.lower_inclusive
                                else vmax_pfx <= lo))
        if self.upper is not None:
            # all values > upper?  v >= min >= vmin_pfx
            up = self.upper
            above = (vmin_pfx > up if self.upper_inclusive
                     else vmin_pfx >= up)
        if (below or above) and not nulls_keep:
            return NONE
        if below or above:
            return SOME
        # min >= vmin_pfx always (a prefix sorts <= its full value), so
        # vmin_pfx > lower proves min > lower, and >= proves >= —
        # exactness not needed on the lower side
        lower_ok = self.lower is None or vmin_pfx > self.lower or (
            self.lower_inclusive and vmin_pfx >= self.lower)
        upper_ok = self.upper is None or (
            self.upper[: len(vmax_pfx)] > vmax_pfx) or (
            vmax_exact and (vmax_pfx <= self.upper if self.upper_inclusive
                            else vmax_pfx < self.upper))
        if lower_ok and upper_ok and (not has_null or self.null_allowed):
            return ALL
        return SOME

    def to_spark_condition(self):
        from pyspark.sql import functions as F

        c = F.col(self.column)

        def lit(v):
            try:
                return v.decode("utf-8")
            except UnicodeDecodeError:  # binary column: bytes literal
                return F.lit(v)

        cond = F.lit(True)
        if self.lower is not None:
            lo = lit(self.lower)
            cond = cond & ((c >= lo) if self.lower_inclusive else (c > lo))
        if self.upper is not None:
            up = lit(self.upper)
            cond = cond & ((c <= up) if self.upper_inclusive else (c < up))
        if self.null_allowed:
            cond = cond | c.isNull()
        else:
            cond = cond & c.isNotNull()
        return cond

    def jvm_zone_keep(self, st):
        from pyspark.sql import functions as F

        keep = F.lit(True)
        if self.lower is not None:
            # drop groups provably below the range: lower above the max
            keep = keep & _jvm_bytes_not_above(F.lit(self.lower), st)
        if self.upper is not None:
            # drop groups provably above the range: upper below the min
            keep = keep & _jvm_bytes_not_below_eq(F.lit(self.upper), st)
        if self.null_allowed:
            keep = keep | F.coalesce(st.getField("has_null"), F.lit(True))
        return keep
