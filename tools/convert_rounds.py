#!/usr/bin/env python
"""One-shot mechanical conversion of engine round() to binary-floor
(r10 verdict task #4 — see lawfirm_data_pipeline_spark/functions/
rounding.py for why engine rounds on doubles are forbidden in paired
positions).

Two phases over the package sources, driven by Python's tokenize so
string literals and code cannot be confused:

* Phase A (code): every ``F.round(EXPR[, d])`` outside string literals
  becomes ``bfround(EXPR[, d])`` (import added), except sites whose
  EXPR text contains a decimal cast — decimal rounds agree across
  engines and must stay engine-rounds.
* Phase B (SQL strings): every bare ``round(EXPR[, d])`` token INSIDE
  a string literal (the DuckDB oracle SQL) is expanded to the inline
  binary-floor CASE produced by ``bfround_sql`` — the driver runs
  oracle SQL verbatim, so no macro/UDF can carry the convention.

Sites the matcher cannot convert safely (non-literal scale, f-string
braces inside the argument, decimal casts) are reported for manual
review instead of silently skipped.  --dry-run prints the per-file
site counts without writing.
"""

from __future__ import annotations

import argparse
import io
import os
import re
import sys
import tokenize

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from lawfirm_data_pipeline_spark.functions.rounding import bfround_sql  # noqa: E402

PKG = os.path.join(_REPO, "lawfirm_data_pipeline_spark")

_IMPORT = "from lawfirm_data_pipeline_spark.functions.rounding import bfround\n"


def _match_paren(text: str, open_idx: int) -> int:
    """Index just past the ')' matching text[open_idx] == '('."""
    depth = 0
    for i in range(open_idx, len(text)):
        c = text[i]
        if c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i + 1
    raise ValueError("unbalanced parens")


def _split_top_comma(s: str) -> list[str]:
    parts, depth, cur = [], 0, []
    for c in s:
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        if c == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(c)
    parts.append("".join(cur))
    return parts


def _convert_code(src: str, path: str, review: list[str]) -> tuple[str, int]:
    """Phase A: F.round( -> bfround( outside string literals."""
    # collect string literal spans so we never touch them
    spans = []
    for tok in tokenize.generate_tokens(io.StringIO(src).readline):
        if tok.type == tokenize.STRING:
            spans.append((tok.start, tok.end))
    lines = src.splitlines(keepends=True)
    offsets = [0]
    for ln in lines:
        offsets.append(offsets[-1] + len(ln))

    def to_off(pos):
        return offsets[pos[0] - 1] + pos[1]

    protected = [(to_off(a), to_off(b)) for a, b in spans]

    def in_string(i: int) -> bool:
        return any(a <= i < b for a, b in protected)

    n = 0
    out = src
    while True:
        m = None
        for mm in re.finditer(r"F\.round\(", out):
            if not in_string(mm.start()):
                m = mm
                break
        if m is None:
            break
        end = _match_paren(out, m.end() - 1)
        inner = out[m.end() : end - 1]
        args = _split_top_comma(inner)
        if len(args) > 1 and not args[-1].strip():
            args = args[:-1]  # trailing comma
        if "decimal" in inner.lower():
            review.append(f"{path}: decimal-cast F.round left as-is: {inner[:80]}")
            # mask so the loop advances: engine round on decimal is the
            # approved exact path (restored verbatim below)
            out = out[: m.start()] + "__KEEP_ROUND__(" + out[m.end() :]
            continue
        if len(args) == 1:
            repl = f"bfround({args[0].strip()})"
        elif len(args) == 2 and re.fullmatch(r"\s*-?\d+\s*", args[1]):
            repl = f"bfround({args[0].strip()}, {args[1].strip()})"
        else:
            review.append(f"{path}: non-literal scale F.round left: {inner[:80]}")
            out = out[: m.start()] + "__KEEP_ROUND__(" + out[m.end() :]
            continue
        out = out[: m.start()] + repl + out[end:]
        n += 1
        # recompute protected spans (offsets shifted)
        try:
            spans = [
                (t.start, t.end)
                for t in tokenize.generate_tokens(io.StringIO(out).readline)
                if t.type == tokenize.STRING
            ]
            lines = out.splitlines(keepends=True)
            offsets = [0]
            for ln in lines:
                offsets.append(offsets[-1] + len(ln))
            protected = [(to_off(a), to_off(b)) for a, b in spans]
        except Exception:
            pass
    out = out.replace("__KEEP_ROUND__(", "F.round(")
    if n and _IMPORT not in out:
        # insert after the last top-level import block line
        code_lines = out.splitlines(keepends=True)
        last_imp = 0
        for i, ln in enumerate(code_lines):
            if re.match(r"(from |import )", ln):
                last_imp = i
        code_lines.insert(last_imp + 1, _IMPORT)
        out = "".join(code_lines)
    return out, n


def _sql_comment_spans(text: str) -> list[tuple[int, int]]:
    """[start, end) spans of SQL '--' line comments and /* */ blocks.

    Single-quoted SQL string literals are honored so a quoted '--' or
    '/*' does not open a phantom comment (r11 ADVICE #1: the converter
    rewrote prose inside a '--' comment into a garbled CASE)."""
    spans = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "'":  # SQL string literal; '' is the escaped quote
            j = i + 1
            while j < n:
                if text[j] == "'":
                    if j + 1 < n and text[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            i = j + 1
        elif text.startswith("--", i):
            j = text.find("\n", i)
            j = n if j < 0 else j
            spans.append((i, j))
            i = j
        elif text.startswith("/*", i):
            j = text.find("*/", i + 2)
            j = n if j < 0 else j + 2
            spans.append((i, j))
            i = j
        else:
            i += 1
    return spans


_ROUND_RE = re.compile(r"(?<![\w.])round\s*\(", re.I)


def _convert_sql_text(text: str, path: str, review: list[str]) -> tuple[str, int]:
    """Expand bare round( tokens inside one string literal's text.

    Nested calls convert INNERMOST-FIRST (r11 ADVICE #2): converting an
    outer round() while an inner one still sits in its argument would
    splice the unconverted inner into every copy of the CASE expansion
    — correct but exponentially blown up — and the old scan's
    resume-past-the-replacement skipped the inner entirely."""
    n = 0
    pos = 0
    while True:
        m = _ROUND_RE.search(text, pos)
        if not m:
            break
        start = m.start()
        op = m.end() - 1
        # comment text is prose, not SQL to convert (r11 ADVICE #1);
        # spans are recomputed per hit since text mutates on replace
        comment = next(
            (sp for sp in _sql_comment_spans(text) if sp[0] <= start < sp[1]),
            None,
        )
        if comment:
            pos = comment[1]
            continue
        try:
            end = _match_paren(text, op)
        except ValueError:
            review.append(f"{path}: unbalanced SQL round( near: {text[start:start+60]!r}")
            pos = op + 1
            continue
        inner = text[op + 1 : end - 1]
        nested = _ROUND_RE.search(inner)
        if nested and not any(
            a <= op + 1 + nested.start() < b for a, b in _sql_comment_spans(text)
        ):
            # convert the inner call first; the outer re-matches after
            pos = op + 1
            continue
        if "..." in inner:
            # prose like "round(...,2)" inside SQL comments/docstrings
            review.append(f"{path}: prose round( left: {inner[:60]}")
            pos = end
            continue
        if re.search(r"\bAS\s+DECIMAL", inner, re.I) and "AS DOUBLE" not in inner.upper():
            # engine round on an exact DECIMAL expr is the approved
            # exact path (the q15 pattern) — must stay paired with the
            # Spark side's decimal round, never become binary-floor
            review.append(f"{path}: decimal SQL round left as-is: {inner[:80]}")
            pos = end
            continue
        args = _split_top_comma(inner)
        if len(args) > 1 and not args[-1].strip():
            args = args[:-1]  # trailing comma
        if len(args) == 1 and re.fullmatch(r"\s*-?[\d.]+\s*", args[0]):
            # "round(6)" / "round(4)" is prose naming a scale, never a
            # real SQL call (rounding a literal constant)
            review.append(f"{path}: literal-constant round( left: {inner[:60]}")
            pos = end
            continue
        if len(args) == 1:
            d = 0
        elif len(args) == 2 and re.fullmatch(r"\s*-?\d+\s*", args[1]):
            d = int(args[1])
        else:
            review.append(f"{path}: non-literal SQL round scale: {inner[:80]}")
            pos = end
            continue
        repl = bfround_sql(args[0].strip(), d)
        text = text[:start] + repl + text[end:]
        # rescan from the top: an OUTER round() whose argument this
        # site just was (skipped above to convert innermost-first) sits
        # BEFORE start and must now be revisited.  Converges: each
        # replacement removes one bare round( and bfround_sql's own
        # text contains none.
        pos = 0
        n += 1
    # outer calls deferred to a nested site that then proved
    # unconvertible (decimal/prose/non-literal) end the loop silently;
    # surface them so no bare round( is ever dropped from review
    for m in _ROUND_RE.finditer(text):
        if any(a <= m.start() < b for a, b in _sql_comment_spans(text)):
            continue
        try:
            end = _match_paren(text, m.end() - 1)
        except ValueError:
            continue
        if _ROUND_RE.search(text[m.end() : end - 1]):
            review.append(
                f"{path}: outer round( with unconvertible nested round "
                f"left as-is: {text[m.start():m.start()+80]}"
            )
    return text, n


def _convert_sql(src: str, path: str, review: list[str]) -> tuple[str, int]:
    """Phase B: rewrite round( inside string literals only."""
    result = []
    n = 0
    last = 0
    toks = list(tokenize.generate_tokens(io.StringIO(src).readline))
    lines = src.splitlines(keepends=True)
    offsets = [0]
    for ln in lines:
        offsets.append(offsets[-1] + len(ln))

    def to_off(pos):
        return offsets[pos[0] - 1] + pos[1]

    for tok in toks:
        if tok.type != tokenize.STRING:
            continue
        a, b = to_off(tok.start), to_off(tok.end)
        lit = src[a:b]
        if not re.search(r"(?<![\w.])round\s*\(", lit, re.I):
            continue
        if not re.search(r"\bSELECT\b", lit, re.I):
            # docstring/helper prose, not an oracle SQL literal — the
            # convention docs themselves say "round(6)" etc. (r12 fix:
            # a re-run must not garble the prose describing the rule)
            continue
        # split the literal into prefix+quote, body, quote
        m = re.match(r"(?i)([a-z]*)('''|\"\"\"|'|\")", lit)
        pre, quote = m.group(1), m.group(2)
        body = lit[len(pre) + len(quote) : -len(quote)]
        new_body, k = _convert_sql_text(body, path, review)
        if k:
            result.append((a, b, pre + quote + new_body + quote))
            n += k
    out = src
    for a, b, rep in sorted(result, reverse=True):
        out = out[:a] + rep + out[b:]
    return out, n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--dry-run", action="store_true")
    ap.add_argument("--files", default=None, help="comma list to restrict")
    args = ap.parse_args()

    targets = []
    for root, _dirs, files in os.walk(PKG):
        for f in sorted(files):
            if f.endswith(".py") and f != "rounding.py":
                targets.append(os.path.join(root, f))
    if args.files:
        keep = set(args.files.split(","))
        targets = [t for t in targets if os.path.basename(t) in keep]

    review: list[str] = []
    tot_a = tot_b = 0
    for path in targets:
        src = open(path).read()
        rel = os.path.relpath(path, _REPO)
        out, na = _convert_code(src, rel, review)
        out, nb = _convert_sql(out, rel, review)
        if na or nb:
            print(f"{rel}: {na} code sites, {nb} sql sites")
            tot_a += na
            tot_b += nb
            if not args.dry_run:
                open(path, "w").write(out)
    print(f"TOTAL: {tot_a} code sites, {tot_b} sql sites")
    if review:
        print("== MANUAL REVIEW NEEDED ==")
        for r in review:
            print("  " + r)


if __name__ == "__main__":
    main()
