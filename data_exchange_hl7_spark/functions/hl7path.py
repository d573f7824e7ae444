"""HL7-path field extraction as pure column expressions (reference D7).

The reference calls ``HL7StaticParser.getFirstValue(msg, "OBX[@3.1='77968-6']-5.1")``
everywhere (predicate-indexed field lookup; Spark-POC UDF wrapper at
spikes/cbs-pipeline/bronze/hl7/fn_validate_hl7.scala:5-16). Here the path is
parsed ONCE in Python and compiled to a chain of split/filter/try_element_at
column expressions — fully JVM-side, whole-stage-codegen'd, no UDF.

Supported grammar (the subset the reference exercises):

    SEG                      first segment of type SEG, whole line
    SEG-3                    field 3
    SEG-3.2                  component 2 of field 3
    SEG-3.2.1                subcomponent 1
    SEG[2]-3                 2nd occurrence of SEG
    SEG-21[1].1              1st ~-repeat of field 21, component 1
                             (profile_config.json identifier-path shape)
    SEG[@3.1='X']-5.1        first SEG whose field3.comp1 == 'X'

Field numbering follows HL7: for MSH, field N lives at split index N-1
(MSH-1 is the field separator itself); for every other segment at index N.
Repeats (~) resolve to the first repeat, as getFirstValue does, unless an
explicit field-repeat index ``[r]`` is given.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

_PATH_RE = re.compile(
    r"^(?P<seg>[A-Z0-9]{3})"
    r"(?:\[(?:(?P<idx>\d+)|@(?P<pf>\d+)(?:\.(?P<pc>\d+))?='(?P<pv>[^']*)')\])?"
    r"(?:-(?P<field>\d+)(?:\[(?P<frep>\d+)\])?(?:\.(?P<comp>\d+)(?:\.(?P<sub>\d+))?)?)?$"
)


@dataclass(frozen=True)
class HL7Path:
    seg: str
    occurrence: int | None  # 1-based
    pred_field: int | None
    pred_comp: int | None
    pred_value: str | None
    field: int | None
    field_repeat: int | None  # 1-based ~-repeat of the field
    comp: int | None
    sub: int | None


def parse_path(path: str) -> HL7Path:
    m = _PATH_RE.match(path.strip())
    if not m:
        raise ValueError(f"unsupported HL7 path: {path!r}")
    g = m.groupdict()
    return HL7Path(
        seg=g["seg"],
        occurrence=int(g["idx"]) if g["idx"] else None,
        pred_field=int(g["pf"]) if g["pf"] else None,
        pred_comp=int(g["pc"]) if g["pc"] else None,
        pred_value=g["pv"],
        field=int(g["field"]) if g["field"] else None,
        field_repeat=int(g["frep"]) if g["frep"] else None,
        comp=int(g["comp"]) if g["comp"] else None,
        sub=int(g["sub"]) if g["sub"] else None,
    )


def _field_from_line(line: Column, seg: str, field: int) -> Column:
    """Extract field N from a segment line (HL7 numbering, see module doc)."""
    idx = field - 1 if seg == "MSH" else field
    if seg == "MSH" and field == 1:
        return F.lit("|")
    return F.try_element_at(F.split(line, r"\|"), F.lit(idx + 1))


def _narrow(val: Column, comp: int | None, sub: int | None, repeat: int = 1) -> Column:
    # field repeat (default first), then component, then subcomponent
    val = F.try_element_at(F.split(val, "~"), F.lit(repeat))
    if comp is not None:
        val = F.try_element_at(F.split(val, r"\^"), F.lit(comp))
        if sub is not None:
            val = F.try_element_at(F.split(val, "&"), F.lit(sub))
    return val


def segments_of(content: Column, seg: str) -> Column:
    """Array of segment lines of the given type, in message order."""
    lines = F.split(content, "\r?\n")
    return F.filter(lines, lambda x: x.startswith(seg + "|") | (F.trim(x) == seg))


def hl7_get(content, path: str) -> Column:
    """getFirstValue: the value at ``path`` in the first matching segment,
    or null. Pure column expression."""
    p = parse_path(path)
    content = F.col(content) if isinstance(content, str) else content
    segs = segments_of(content, p.seg)
    if p.pred_field is not None:
        def pred(line):
            v = _field_from_line(line, p.seg, p.pred_field)
            v = _narrow(v, p.pred_comp, None) if p.pred_comp else F.try_element_at(F.split(v, "~"), F.lit(1))
            return v == p.pred_value
        segs = F.filter(segs, pred)
    line = F.try_element_at(segs, F.lit(p.occurrence or 1))
    if p.field is None:
        return line
    return _narrow(
        _field_from_line(line, p.seg, p.field), p.comp, p.sub, p.field_repeat or 1
    )


def hl7_get_all(content, path: str) -> Column:
    """getValue: array of values at ``path`` across ALL matching segments."""
    p = parse_path(path)
    content = F.col(content) if isinstance(content, str) else content
    segs = segments_of(content, p.seg)
    if p.pred_field is not None:
        def pred(line):
            v = _field_from_line(line, p.seg, p.pred_field)
            v = _narrow(v, p.pred_comp, None) if p.pred_comp else F.try_element_at(F.split(v, "~"), F.lit(1))
            return v == p.pred_value
        segs = F.filter(segs, pred)
    if p.field is None:
        return segs
    return F.transform(
        segs,
        lambda line: _narrow(
            _field_from_line(line, p.seg, p.field), p.comp, p.sub, p.field_repeat or 1
        ),
    )


def delimiter_check(content) -> Column:
    """D8 delimiter sanity: message must start 'MSH|^~\\&'
    (fn-structure-validator Function.kt:193-205)."""
    content = F.col(content) if isinstance(content, str) else content
    return F.substring(content, 1, 8) == "MSH|^~\\&"
