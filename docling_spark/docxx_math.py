"""OMML (Office Math Markup Language) → LaTeX for the DOCX backend.

Role parity with the reference's equation path
(/root/reference/docling/backend/docx/latex/omml.py — itself adapted from
the public dwml project; the OMML element model is the public ECMA-376
Part 1 §22.1 spec). This is an independent implementation: one recursive
dispatch over the m: namespace rather than a class/tag-method table, with a
small unicode map standing in for the reference's pylatexenc dependency
(not available here). The observable output contract (spacing quirks
included) is pinned by the equations.docx / table_with_equations.docx
golden markdown files:

- math-mode symbols surface with double spaces (``A=  \\pi  r`` before the
  final two-space collapse) because the reference strips an
  ``\\ensuremath{...}`` wrapper by replacing braces with spaces;
- text-mode symbols surface as `` \\text{ \\texttimes } ``;
- ``\\{``/``\\}`` introduced by escaping are restored to bare braces when
  the source text contained none (the reference's do_r quirk);
- the final string collapses double spaces once (non-overlapping).
"""

from __future__ import annotations

from typing import Optional

M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

_ESCAPE_CHARS = ("{", "}", "_", "^", "#", "&", "$", "%", "~")

# unicode → (latex, mode); mode "math" = \ensuremath-style (double-space
# unwrap), "text" = \text{ ... } wrap — mirrors how pylatexenc classifies
_UNICODE_LATEX: dict[str, tuple[str, str]] = {
    "π": ("\\pi", "math"),
    "∞": ("\\infty", "math"),
    "±": ("\\pm", "math"),
    "∓": ("\\mp", "math"),
    "≤": ("\\leq", "math"),
    "≥": ("\\geq", "math"),
    "≠": ("\\neq", "math"),
    "−": ("-", "ascii"),
    # ascii angle brackets also take the \ensuremath path in the
    # reference's encoder, leaving the double-space artifact the
    # equations.docx golden shows around "< x <"
    "<": ("<", "math"),
    ">": (">", "math"),
    "×": ("\\texttimes", "text"),
    "÷": ("\\textdiv", "text"),
    "…": ("\\textellipsis", "text"),
    "α": ("\\alpha", "math"),
    "β": ("\\beta", "math"),
    "γ": ("\\gamma", "math"),
    "δ": ("\\delta", "math"),
    "ε": ("\\varepsilon", "math"),
    "θ": ("\\theta", "math"),
    "λ": ("\\lambda", "math"),
    "μ": ("\\mu", "math"),
    "σ": ("\\sigma", "math"),
    "φ": ("\\varphi", "math"),
    "ω": ("\\omega", "math"),
}

_BIG_OPS = {
    "∑": "\\sum",
    "∏": "\\prod",
    "∫": "\\int",
    "⋀": "\\bigwedge",
    "⋁": "\\bigvee",
    "⋂": "\\bigcap",
    "⋃": "\\bigcup",
}

_FRAC_TYPES = {
    "bar": "\\frac{{{num}}}{{{den}}}",
    "skw": r"^{{{num}}}/_{{{den}}}",
    "noBar": "\\genfrac{{}}{{}}{{0pt}}{{}}{{{num}}}{{{den}}}",
    "lin": "{{{num}}}/{{{den}}}",
}

_FUNC_NAMES = {
    "sin": "\\sin({fe})",
    "cos": "\\cos({fe})",
    "tan": "\\tan({fe})",
    "arcsin": "\\arcsin({fe})",
    "arccos": "\\arccos({fe})",
    "arctan": "\\arctan({fe})",
    "sinh": "\\sinh({fe})",
    "cosh": "\\cosh({fe})",
    "tanh": "\\tanh({fe})",
    "sec": "\\sec({fe})",
    "csc": "\\csc({fe})",
    "mod": "\\mod {fe}",
    "max": "\\max({fe})",
    "min": "\\min({fe})",
}

_LIM_FUNCS = {
    "lim": "\\lim_{{{lim}}}",
    "max": "\\max_{{{lim}}}",
    "min": "\\min_{{{lim}}}",
}

_DIRECT = {"box", "sSub", "sSup", "sSubSup", "num", "den", "deg", "e"}


def _escape(s: str) -> str:
    out = []
    last = None
    s = s.replace("\\\\", "\\")
    for c in s:
        if c in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + c)
        else:
            out.append(c)
        last = c
    return "".join(out)


def _uni(ch: str) -> str:
    entry = _UNICODE_LATEX.get(ch)
    if entry is None:
        return ch
    latex, mode = entry
    if mode == "ascii":
        return latex
    if mode == "text":
        return f" \\text{{ {latex} }} "
    return f"  {latex}  "  # math: \ensuremath brace-strip leaves 2 spaces


def _prop_val(pr, tag: str) -> Optional[str]:
    if pr is None:
        return None
    el = pr.find(M + tag)
    if el is None:
        return None
    return el.get(M + "val")


def _children(el, names: Optional[set] = None):
    for c in el:
        if not c.tag.startswith(M):
            continue
        tag = c.tag[len(M) :]
        if names is None or tag in names:
            yield tag, c


def _conv(el) -> str:
    """One OMML element → latex (recursive)."""
    tag = el.tag[len(M) :] if el.tag.startswith(M) else el.tag

    if tag == "r":
        t = el.findtext(f"./{M}t") or ""
        raw = "".join(_uni(c) for c in t)
        proc = _escape(raw)
        if "{" not in t and "\\{" in proc:
            proc = proc.replace("\\{", "{")
        if "}" not in t and "\\}" in proc:
            proc = proc.replace("\\}", "}")
        return proc

    if tag == "f":
        num = _first(el, "num")
        den = _first(el, "den")
        ftype = _prop_val(el.find(M + "fPr"), "type")
        fmt = _FRAC_TYPES.get(ftype, "\\frac{{{num}}}{{{den}}}")
        return fmt.format(num=num, den=den)

    if tag == "d":
        pr = el.find(M + "dPr")
        beg = _prop_val(pr, "begChr")
        end = _prop_val(pr, "endChr")
        beg = "(" if beg is None else (_escape(beg) if beg else ".")
        end = ")" if end is None else (_escape(end) if end else ".")
        inner = _join(el, {"e"})
        return f"\\left{beg}{inner}\\right{end}"

    if tag == "nary":
        pr = el.find(M + "naryPr")
        chr_val = _prop_val(pr, "chr")
        bo = _BIG_OPS.get(chr_val, chr_val or "\\int")
        rest = "".join(
            _conv(c) for t_, c in _children(el) if t_ != "naryPr"
        )
        return bo + rest

    if tag == "sub":
        return "_{" + _join_all(el) + "}"
    if tag == "sup":
        return "^{" + _join_all(el) + "}"

    if tag == "rad":
        deg = _first(el, "deg")
        text = _first(el, "e")
        if deg:
            return f"\\sqrt[{deg}]{{{text}}}"
        return f"\\sqrt{{{text}}}"

    if tag == "func":
        fname = _first(el, "fName")
        e = _first(el, "e")
        return (fname or "{fe}").replace("{fe}", e or "")

    if tag == "fName":
        parts = []
        for t_, c in _children(el):
            s = _conv(c)
            if t_ == "r" and s in _FUNC_NAMES:
                parts.append(_FUNC_NAMES[s])
            else:
                parts.append(s)
        joined = "".join(parts)
        return joined if "{fe}" in joined else joined + "{fe}"

    if tag == "limLow":
        e = _first(el, "e")
        lim = _first(el, "lim")
        fmt = _LIM_FUNCS.get(e or "")
        if fmt is None:
            return (e or "") + "_{" + (lim or "") + "}"
        return fmt.format(lim=lim)

    if tag == "limUpp":
        e = _first(el, "e")
        lim = _first(el, "lim")
        return f"\\overset{{{lim}}}{{{e}}}"

    if tag == "lim":
        return _join_all(el).replace("\\rightarrow", "\\to")

    if tag == "m":  # matrix
        rows = [
            "&".join(_conv(c2) for t2, c2 in _children(row, {"e"}))
            for t_, row in _children(el, {"mr"})
        ]
        return "\\begin{matrix}" + "\\\\".join(rows) + "\\end{matrix}"

    if tag == "eqArr":
        return "\\\\".join(_conv(c) for t_, c in _children(el, {"e"}))

    if tag == "bar":
        pos = _prop_val(el.find(M + "barPr"), "pos")
        e = _first(el, "e")
        if pos == "bot":
            return f"\\underline{{{e}}}"
        return f"\\overline{{{e}}}"

    if tag == "acc":
        chr_val = _prop_val(el.find(M + "accPr"), "chr")
        e = _first(el, "e")
        accents = {
            "̂": "\\hat{{{0}}}",
            "̄": "\\bar{{{0}}}",
            "̇": "\\dot{{{0}}}",
            "⃗": "\\vec{{{0}}}",
            "̃": "\\tilde{{{0}}}",
        }
        fmt = accents.get(chr_val, "\\hat{{{0}}}")
        return fmt.format(e)

    if tag == "groupChr":
        chr_val = _prop_val(el.find(M + "groupChrPr"), "chr") or ""
        e = _first(el, "e")
        return f"{chr_val}{{{e}}}" if "{" in chr_val else chr_val + (e or "")

    if tag in _DIRECT:
        return _join_all(el)

    if tag.endswith("Pr") or tag == "ctrlPr":
        return ""

    return _join_all(el)


def _join_all(el) -> str:
    return "".join(_conv(c) for _, c in _children(el))


def _join(el, names: set) -> str:
    return "".join(_conv(c) for _, c in _children(el, names))


def _first(el, name: str) -> Optional[str]:
    for t_, c in _children(el, {name}):
        return _conv(c)
    return None


def omath_to_latex(omath_el) -> str:
    """m:oMath element → latex string (reference str(oMath2Latex) role,
    including the final single-pass double-space collapse)."""
    return _join_all(omath_el).replace("  ", " ")
