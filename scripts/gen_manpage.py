#!/usr/bin/env python3
"""Generate docs/minimodem-tpu.1 (roff) + docs/minimodem-tpu.html from
docs/MANUAL.md.

The reference ships a man page AND an HTML rendering built from ronn
source (/root/reference/src/Makefile.am:27-29,60-62 builds minimodem.1
and minimodem.html from minimodem.1.ronn); here MANUAL.md is the single
source of truth and this script renders the constrained markdown subset
it uses — title line, ## sections, fenced code blocks, tables, bullet
lists, paragraphs, `code`/*emph* inlines — to man(7) roff and to a
self-contained HTML page.

Usage:
    python scripts/gen_manpage.py            # writes both outputs
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
DST_HTML = os.path.join(ROOT, "docs", "minimodem-tpu.html")


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


def html_esc(s: str) -> str:
    return (s.replace("&", "&amp;").replace("<", "&lt;")
             .replace(">", "&gt;"))


def html_inline(s: str) -> str:
    s = html_esc(s)
    s = re.sub(r"`([^`]*)`", r"<code>\1</code>", s)
    s = re.sub(r"\*([^*\s][^*]*)\*", r"<em>\1</em>", s)
    return s


_CSS = """\
body { font-family: sans-serif; max-width: 50em; margin: 2em auto;
       padding: 0 1em; line-height: 1.45; }
h1 { font-size: 1.3em; border-bottom: 1px solid #999; }
h2 { font-size: 1.1em; margin-top: 1.6em; }
pre { background: #f4f4f4; padding: .6em .8em; overflow-x: auto; }
code { background: #f4f4f4; padding: 0 .15em; }
pre code { padding: 0; }
table { border-collapse: collapse; margin: .6em 0; }
td, th { border: 1px solid #bbb; padding: .25em .55em;
         text-align: left; vertical-align: top; }
dt { font-weight: bold; font-family: monospace; margin-top: .6em; }
dd { margin: .15em 0 .4em 2em; }
"""


def render_html(md: str) -> str:
    """Render the same constrained markdown subset to a self-contained
    HTML page (the reference's HTML man page analogue,
    /root/reference/src/Makefile.am:60-62)."""
    lines = md.split("\n")
    m = re.match(r"#\s+(\S+)\((\d+)\)\s+[—-]+\s+(.*)", lines[0])
    name, sect, desc = m.group(1), m.group(2), m.group(3)
    out = [
        "<!DOCTYPE html>",
        '<html lang="en"><head><meta charset="utf-8">',
        f"<title>{html_esc(name)}({sect}) — {html_esc(desc)}</title>",
        f"<style>\n{_CSS}</style></head><body>",
        f"<h1>{html_esc(name)}({sect}) — {html_esc(desc)}</h1>",
    ]
    i = 1
    in_dl = False

    def close_dl():
        nonlocal in_dl
        if in_dl:
            out.append("</dl>")
            in_dl = False

    while i < len(lines):
        ln = lines[i]
        if ln.startswith("```"):
            i += 1
            block = []
            while i < len(lines) and not lines[i].startswith("```"):
                block.append(lines[i])
                i += 1
            i += 1
            close_dl()
            out.append("<pre><code>"
                       + "\n".join(html_esc(b) for b in block)
                       + "</code></pre>")
            continue
        if ln.startswith("## "):
            close_dl()
            out.append(f"<h2>{html_inline(ln[3:].strip())}</h2>")
            i += 1
            continue
        if ln.startswith("|"):
            rows = []
            while i < len(lines) and lines[i].startswith("|"):
                cells = [c.strip() for c in lines[i].strip("|").split("|")]
                if not all(set(c) <= set(":- ") for c in cells):
                    rows.append(cells)
                i += 1
            close_dl()
            out.append("<table>")
            for k, r in enumerate(rows):
                tag = "th" if k == 0 else "td"
                out.append("<tr>" + "".join(
                    f"<{tag}>{html_inline(c)}</{tag}>" for c in r)
                    + "</tr>")
            out.append("</table>")
            continue
        if ln.startswith("- "):
            item = [ln[2:]]
            i += 1
            while i < len(lines) and lines[i].startswith("  ") \
                    and lines[i].strip():
                item.append(lines[i].strip())
                i += 1
            text = " ".join(item)
            m2 = re.match(r"`([^`]*)`\s+[—-]+\s+(.*)", text)
            if m2:
                if not in_dl:
                    out.append("<dl>")
                    in_dl = True
                out.append(f"<dt>{html_esc(m2.group(1))}</dt>")
                out.append(f"<dd>{html_inline(m2.group(2))}</dd>")
            else:
                close_dl()
                out.append(f"<ul><li>{html_inline(text)}</li></ul>")
            continue
        if not ln.strip():
            i += 1
            continue
        para = []
        while i < len(lines) and lines[i].strip() \
                and not lines[i].startswith(("```", "## ", "|", "- ")):
            para.append(lines[i])
            i += 1
        close_dl()
        out.append("<p>" + "\n".join(html_inline(p) for p in para) + "</p>")
    close_dl()
    out.append("</body></html>")
    return "\n".join(out) + "\n"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    args = ap.parse_args()
    with open(SRC) as f:
        md = f.read()
    outputs = [(DST, render(md)), (DST_HTML, render_html(md))]
    if args.check:
        for dst, want in outputs:
            try:
                with open(dst) as f:
                    cur = f.read()
            except FileNotFoundError:
                cur = ""
            if cur != want:
                print(f"{dst} is out of date; run scripts/gen_manpage.py",
                      file=sys.stderr)
                return 1
        print("man page + html are current")
        return 0
    for dst, text in outputs:
        with open(dst, "w") as f:
            f.write(text)
        print(f"wrote {dst} ({len(text)} bytes)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
