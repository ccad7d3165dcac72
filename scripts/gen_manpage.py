#!/usr/bin/env python3
"""Generate docs/minimodem-tpu.1 (roff) from docs/MANUAL.md.

The reference ships a man page built from ronn source
(/root/reference/src/Makefile.am:27-29 builds minimodem.1 + HTML from
minimodem.1.ronn); here MANUAL.md is the single source of truth and
this script renders the constrained markdown subset it uses — title
line, ## sections, fenced code blocks, tables, bullet lists,
paragraphs, `code`/*emph* inlines — to man(7) roff.

Usage:
    python scripts/gen_manpage.py            # writes docs/minimodem-tpu.1
    python scripts/gen_manpage.py --check    # exit 1 if out of date
    man docs/minimodem-tpu.1                 # view
"""

import argparse
import os
import re
import sys

ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
SRC = os.path.join(ROOT, "docs", "MANUAL.md")
DST = os.path.join(ROOT, "docs", "minimodem-tpu.1")


def esc(s: str) -> str:
    s = s.replace("\\", "\\e")
    if s.startswith(".") or s.startswith("'"):
        s = "\\&" + s
    return s


def inline(s: str) -> str:
    s = esc(s)
    s = re.sub(r"`([^`]*)`", r"\\fB\1\\fR", s)
    s = re.sub(r"\*([^*\s][^*]*)\*", r"\\fI\1\\fR", s)
    return s


def render(md: str) -> str:
    lines = md.split("\n")
    out = []
    i = 0

    # title: "# name(sect) — description"
    m = re.match(r"#\s+(\S+)\((\d+)\)\s+[—-]+\s+(.*)", lines[0])
    name, sect, desc = m.group(1), m.group(2), m.group(3)
    out.append(f'.TH {name.upper()} {sect} "" "minimodem-tpu" '
               f'"General Commands Manual"')
    out.append(".SH NAME")
    out.append(f"{name} \\- {esc(desc)}")
    i = 1

    in_para = False

    def para_break():
        nonlocal in_para
        in_para = False

    first_code = True
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            # fenced code block; the first one is the SYNOPSIS
            i += 1
            block = []
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            i += 1
            if first_code:
                out.append(".SH SYNOPSIS")
                first_code = False
            out.append(".PP")
            out.append(".RS 2")
            out.append(".nf")
            for b in block:
                out.append(esc(b))
            out.append(".fi")
            out.append(".RE")
            para_break()
            continue
        first_code = False if out[-1:] == [".SH SYNOPSIS"] else first_code
        if ln.startswith("## "):
            out.append(".SH " + esc(ln[3:].strip().upper()))
            para_break()
            i += 1
            continue
        if ln.startswith("|"):
            # markdown table -> tbl
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                if not all(set(c) <= set(":- ") for c in cells):
                    rows.append(cells)
                i += 1
            ncol = max(len(r) for r in rows)
            out.append(".TS")
            out.append("allbox tab(;);")
            out.append(" ".join(["lb"] * ncol) + "")
            out.append(" ".join(["l"] * ncol) + " .")
            for r in rows:
                out.append(";".join(
                    "T{\n" + inline(c) + "\nT}" for c in r))
            out.append(".TE")
            para_break()
            continue
        if ln.startswith("- "):
            # bullet item, with indented continuation lines
            item = [ln[2:]]
            i += 1
            while i < len(lines) and lines[i].startswith("  ") \
                    and lines[i].strip():
                item.append(lines[i].strip())
                i += 1
            text = " ".join(item)
            # "`--opt` — desc" -> .TP with bold tag
            m2 = re.match(r"`([^`]*)`\s+[—-]+\s+(.*)", text)
            if m2:
                out.append(".TP")
                out.append("\\fB" + esc(m2.group(1)) + "\\fR")
                out.append(inline(m2.group(2)))
            else:
                out.append(".IP \\(bu 2")
                out.append(inline(text))
            para_break()
            continue
        if not ln.strip():
            para_break()
            i += 1
            continue
        # paragraph text
        if not in_para:
            out.append(".PP")
            in_para = True
        out.append(inline(ln))
        i += 1

    out.append(".SH SEE ALSO")
    out.append("minimodem(1)")
    return "\n".join(out) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    with open(SRC) as f:
        roff = render(f.read())
    if args.check:
        try:
            with open(DST) as f:
                cur = f.read()
        except FileNotFoundError:
            cur = ""
        if cur != roff:
            print(f"{DST} is out of date; run scripts/gen_manpage.py",
                  file=sys.stderr)
            return 1
        print("man page is current")
        return 0
    with open(DST, "w") as f:
        f.write(roff)
    print(f"wrote {DST} ({len(roff)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
