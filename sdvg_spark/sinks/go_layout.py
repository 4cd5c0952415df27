"""Go reference-time layout -> JDK DateTimeFormatter pattern translator.

The reference's CSV writer formats datetimes with Go layouts
(``time.Time.Format``, writer/csv/csv.go:275-278; default layout
``2006-01-02T15:04:05Z07:00`` from models/generator_output.go:183-184).
Spark's ``date_format`` takes JDK patterns, so user configs carrying Go
layouts must be translated once on the driver.

Longest-match tokenization over Go's reference-time components; any
non-component text is emitted as a quoted JDK literal (letters are
pattern characters in JDK and must be quoted).

Known approximations (documented, lossy only in edge cases):
- ``_2`` (space-padded day) -> ``d`` (no JDK equivalent)
- ``.999...`` (trailing-zero-trimmed fractions) -> ``.SSS...`` (fixed)
- ``pm`` (lowercase meridiem) -> ``a`` (JDK prints locale form)
"""

from __future__ import annotations

# ordered longest-first so tokenization is greedy
_GO_TO_JDK: list[tuple[str, str]] = [
    ("2006", "yyyy"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    (".000000000", ".SSSSSSSSS"),
    (".000000", ".SSSSSS"),
    (".000", ".SSS"),
    (".999999999", ".SSSSSSSSS"),
    (".999999", ".SSSSSS"),
    (".999", ".SSS"),
    ("15", "HH"),
    ("01", "MM"),
    ("02", "dd"),
    ("03", "hh"),
    ("04", "mm"),
    ("05", "ss"),
    ("06", "yy"),
    ("002", "DDD"),
    ("__2", "DDD"),
    ("_2", "d"),
    ("Z07:00", "XXX"),
    ("Z0700", "XX"),
    ("Z07", "X"),
    ("-07:00", "xxx"),
    ("-0700", "xx"),
    ("-07", "x"),
    ("MST", "zzz"),
    ("PM", "a"),
    ("pm", "a"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]


def go_layout_to_jdk(layout: str) -> str:
    """Translate a Go time layout to a JDK DateTimeFormatter pattern."""
    out: list[str] = []
    literal: list[str] = []

    def flush_literal() -> None:
        if not literal:
            return
        text = "".join(literal)
        literal.clear()
        if any(ch.isalpha() for ch in text) or "'" in text:
            out.append("'" + text.replace("'", "''") + "'")
        else:
            out.append(text)

    i = 0
    n = len(layout)
    while i < n:
        for go, jdk in _GO_TO_JDK:
            if layout.startswith(go, i):
                flush_literal()
                out.append(jdk)
                i += len(go)
                break
        else:
            literal.append(layout[i])
            i += 1
    flush_literal()
    return "".join(out)
