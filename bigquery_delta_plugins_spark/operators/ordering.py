"""As-of / happens-before comparator for unordered sources.

Re-expresses the reference's ``getOrderingCondition``
(BigQueryEventConsumer.java:1486-1558) as a Catalyst ``Column`` predicate
instead of generated SQL text.  Semantics, for "left happens strictly
before right":

With sort keys present::

    (L._sort._key_0 IS NOT NULL AND R._sort._key_0 IS NOT NULL AND
       lexicographic_lt(L._sort, R._sort))
    OR ((L._sort._key_0 IS NULL OR R._sort._key_0 IS NULL) AND fallback)

Without sort keys the whole condition is the fallback::

    L._source_timestamp < R._source_timestamp
    OR (L._source_timestamp = R._source_timestamp
        AND L._sequence_num < R._sequence_num)

NULL comparisons inside the lexicographic expansion follow SQL ternary
logic exactly as the generated BigQuery SQL would (NULL -> not-true ->
that disjunct contributes nothing), so behavior matches the reference
row-for-row.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F

from .. import constants as C

ColRef = Callable[[str], Column]


def _sort_field(side: ColRef, i: int) -> Column:
    return side(C.SORT_KEYS).getField(f"{C.SORT_KEY_FIELD}_{i}")


def lexicographic_lt(left: ColRef, right: ColRef, sort_key_count: int) -> Column:
    """OR-of-ANDs expansion: L < R over ``_sort._key_0.._key_{n-1}``."""
    disjuncts: list[Column] = []
    equal_prefix: Column | None = None
    for i in range(sort_key_count):
        lt = _sort_field(left, i) < _sort_field(right, i)
        disjuncts.append(lt if equal_prefix is None else equal_prefix & lt)
        eq = _sort_field(left, i) == _sort_field(right, i)
        equal_prefix = eq if equal_prefix is None else equal_prefix & eq
    out = disjuncts[0]
    for d in disjuncts[1:]:
        out = out | d
    return out


def timestamp_fallback_lt(left: ColRef, right: ColRef) -> Column:
    """(_source_timestamp, _sequence_num) tiebreak ordering."""
    lts, rts = left(C.SOURCE_TIMESTAMP), right(C.SOURCE_TIMESTAMP)
    return (lts < rts) | ((lts == rts) & (left(C.SEQUENCE_NUM) < right(C.SEQUENCE_NUM)))


def happens_before(left: ColRef, right: ColRef, sort_key_count: int = 0) -> Column:
    """True iff the left event happened strictly before the right event."""
    fallback = timestamp_fallback_lt(left, right)
    if sort_key_count <= 0:
        return fallback
    first_l, first_r = _sort_field(left, 0), _sort_field(right, 0)
    with_keys = (
        first_l.isNotNull()
        & first_r.isNotNull()
        & lexicographic_lt(left, right, sort_key_count)
    )
    backward_compat = (first_l.isNull() | first_r.isNull()) & fallback
    return with_keys | backward_compat
