"""Go reference-time layout → JVM DateTimeFormatter pattern translation.

The reference takes ``-dateformat`` as a Go layout string like
``01/02/2006 15:04:05`` (main.go:45-48) and parses with
``time.Parse(layout, s)`` (helpers/helpers.go:255). Spark's
``to_timestamp`` wants a DateTimeFormatter pattern, so we translate the
Go reference-time tokens. Longest-token-first so ``2006`` wins over
``06`` and ``15`` over ``1``/``5``.
"""

from __future__ import annotations

_TOKENS = [
    ("2006", "yyyy"),
    ("01", "MM"),
    ("02", "dd"),
    ("15", "HH"),
    ("04", "mm"),
    ("05", "ss"),
    (".000", ".SSS"),
    ("January", "MMMM"),
    ("Jan", "MMM"),
    ("Monday", "EEEE"),
    ("Mon", "EEE"),
    ("03", "hh"),
    ("PM", "a"),
    ("-0700", "Z"),
    ("Z07:00", "XXX"),
    ("MST", "zzz"),
    ("06", "yy"),
    ("1", "M"),
    ("2", "d"),
    ("3", "h"),
    ("4", "m"),
    ("5", "s"),
]


def go_layout_to_jvm(layout: str) -> str:
    out: list[str] = []
    i = 0
    while i < len(layout):
        for tok, jvm in _TOKENS:
            if layout.startswith(tok, i):
                out.append(jvm)
                i += len(tok)
                break
        else:
            ch = layout[i]
            # quote letters that would otherwise be pattern chars
            out.append(f"'{ch}'" if ch.isalpha() else ch)
            i += 1
    return "".join(out)
