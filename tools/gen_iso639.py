"""Regenerate kgtk_spark/iso639_data.py from the Debian iso-codes JSON
tables (/usr/share/iso-codes/json/iso_639-*.json, public domain).

Usage: python tools/gen_iso639.py
"""

from __future__ import annotations

import json
from pathlib import Path

SRC = Path("/usr/share/iso-codes/json")
DST = Path(__file__).resolve().parent.parent / "kgtk_spark" / "iso639_data.py"


def codes(name: str, key: str, fields: list[str]) -> set[str]:
    out: set[str] = set()
    for e in json.loads((SRC / name).read_text())[key]:
        for f in fields:
            v = e.get(f)
            if v:
                out.add(v.lower())
    return out


def wrap(codes_list: list[str], width: int = 78) -> str:
    lines: list[str] = []
    cur = ""
    for c in codes_list:
        if len(cur) + len(c) + 1 > width:
            lines.append(cur)
            cur = c
        else:
            cur = c if not cur else cur + " " + c
    if cur:
        lines.append(cur)
    return "\n".join(lines)


def main() -> None:
    a1 = codes("iso_639-2.json", "639-2", ["alpha_2"])
    a3 = codes("iso_639-3.json", "639-3", ["alpha_3", "bibliographic", "terminology"])
    a2 = codes("iso_639-2.json", "639-2", ["alpha_3", "bibliographic", "terminology"])
    a5 = codes("iso_639-5.json", "639-5", ["alpha_3"])
    three = sorted(a3 | a2 | a5)
    body = f'''"""Complete ISO-639 code tables, generated from the Debian ``iso-codes``
package (public domain data, /usr/share/iso-codes/json/iso_639-*.json):

- ``ISO_639_1``: all {len(a1)} two-letter alpha-2 codes (ISO 639-1);
- ``ISO_639_3_ALL``: every alpha-3 code from ISO 639-3 ({len(a3)} codes,
  individual + macro languages, incl. bibliographic/terminology variants
  from 639-2) plus the ISO 639-5 collective codes ({len(a5)}) — {len(three)}
  distinct three-letter codes total.

Regenerate with tools/gen_iso639.py if the source tables change. This is
the same underlying dataset pycountry ships, which the reference uses
(kgtk/value/languagevalidator.py).
"""

ISO_639_1 = """
{wrap(sorted(a1))}
""".split()

ISO_639_3_ALL = """
{wrap(three)}
""".split()
'''
    DST.write_text(body)
    print(f"wrote {DST} ({len(body)} bytes, {len(a1)}+{len(three)} codes)")


if __name__ == "__main__":
    main()
