"""Flag/mask sets — xcube/core/maskset.py:22-258.

``MaskSet`` decodes CF ``flag_masks`` / ``flag_values`` /
``flag_meanings`` attributes into named boolean masks.  Spark mapping
(SURVEY §1.8): generated boolean Columns via ``bitwiseAND`` — pure
codegen expressions, no UDFs:

- flag_masks only:        ``(flags & mask) != 0``   (maskset.py:165-196)
- flag_values only:       ``flags == value``
- both:                   ``(flags & mask) == value``

Bit-range specs like ``"1b-4b"`` (maskset.py:269-305) are parsed into
integer masks.
"""

from __future__ import annotations

import re
from typing import Mapping, Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

_BIT_RANGE = re.compile(r"^(\d+)b(?:-(\d+)b)?$")


def parse_bit_mask(spec: int | str) -> int:
    """'3b' -> bit 3; '1b-4b' -> bits 1..4 (maskset.py:269-305)."""
    if isinstance(spec, int):
        return spec
    m = _BIT_RANGE.match(spec.strip())
    if not m:
        raise ValueError(f"invalid bit spec {spec!r}")
    lo = int(m.group(1))
    hi = int(m.group(2)) if m.group(2) else lo
    mask = 0
    for b in range(lo, hi + 1):
        mask |= 1 << b
    return mask


class MaskSet(Mapping[str, Column]):
    """Named boolean mask columns over an integer flag variable.

    >>> masks = MaskSet("flags", flag_masks=[1, 2, 4],
    ...                 flag_meanings="land cloud invalid")
    >>> df.where(masks["land"] & ~masks["cloud"])
    """

    def __init__(
        self,
        flag_col: str | Column,
        flag_meanings: str | Sequence[str],
        flag_masks: Sequence[int | str] | None = None,
        flag_values: Sequence[int] | None = None,
    ):
        if flag_masks is None and flag_values is None:
            raise ValueError("flag_masks and/or flag_values required")
        col = F.col(flag_col) if isinstance(flag_col, str) else flag_col
        names = (
            flag_meanings.split()
            if isinstance(flag_meanings, str)
            else list(flag_meanings)
        )
        n = len(names)
        masks = [parse_bit_mask(m) for m in flag_masks] if flag_masks else None
        values = list(flag_values) if flag_values else None
        if (masks and len(masks) != n) or (values and len(values) != n):
            raise ValueError("flag_meanings length mismatch with masks/values")

        self._masks: dict[str, Column] = {}
        for i, name in enumerate(names):
            if masks is not None and values is not None:
                c = col.bitwiseAND(F.lit(masks[i])) == F.lit(values[i])
            elif masks is not None:
                c = col.bitwiseAND(F.lit(masks[i])) != F.lit(0)
            else:
                c = col == F.lit(values[i])
            self._masks[name] = c

    def __getitem__(self, name: str) -> Column:
        return self._masks[name]

    def __getattr__(self, name: str) -> Column:
        try:
            return self._masks[name]
        except KeyError:
            raise AttributeError(name)

    def __iter__(self):
        return iter(self._masks)

    def __len__(self):
        return len(self._masks)

    def keys(self):
        return self._masks.keys()
