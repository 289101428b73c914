#!/usr/bin/env python3
"""One-shot mechanical transform (round 8): wrap every oracle-SQL
`CAST(round(<expr>) AS DOUBLE)` emit site as
`(CAST(round(<expr>) AS DOUBLE) + 0.0)` so DuckDB's signed zero
normalizes to +0.0, matching Spark's BigDecimal-based round.

Safety: `x + 0.0` differs from `x` only when x is -0.0, and Spark's
round never emits -0.0, so this can only flip red -> green.
Sites NOT followed by an `AS alias` are skipped and reported (wrapping
would change the emitted column name)."""
import re, sys, glob

MARK = "CAST(round("


def transform(src):
    out = []
    i = 0
    wrapped = skipped = 0
    skips = []
    while True:
        j = src.find(MARK, i)
        if j < 0:
            out.append(src[i:])
            break
        # balance parens from the CAST( opening paren
        k = j + len("CAST(")
        depth = 1
        while depth > 0 and k < len(src):
            if src[k] == "(":
                depth += 1
            elif src[k] == ")":
                depth -= 1
            k += 1
        cast_expr = src[j:k]  # includes closing ')'
        inner = cast_expr[len("CAST("):-1]
        # must be a double emit, not some other cast
        if not re.search(r"\sAS\s+DOUBLE\s*$", inner):
            out.append(src[i:k])
            i = k
            continue
        # already wrapped?
        if src[max(0, j - 1):j] == "(" and src[k:k + 7].strip().startswith("+ 0.0"):
            out.append(src[i:k])
            i = k
            continue
        # require a following alias (or a CASE's END, whose own alias
        # names the column) so the output column name is stable; the
        # Scala margin `|` reads as whitespace here
        after = re.sub(r"\n\s*\|", " ", src[k:k + 80])
        m = re.match(r"\s+(AS\s+\w+|END\b|ELSE\b)", after)
        if not m:
            skipped += 1
            skips.append(src[max(0, j - 40):k + 20].replace("\n", "\\n"))
            out.append(src[i:k])
            i = k
            continue
        out.append(src[i:j])
        out.append("(" + cast_expr + " + 0.0)")
        wrapped += 1
        i = k
    return "".join(out), wrapped, skipped, skips


total_w = total_s = 0
for path in sorted(glob.glob("src/main/scala/graft/queries/*.scala")):
    src = open(path).read()
    new, w, s, skips = transform(src)
    if new != src:
        open(path, "w").write(new)
    total_w += w
    total_s += s
    print(f"{path}: wrapped {w}, skipped {s}")
    for line in skips:
        print(f"  SKIP ...{line}...")
print(f"TOTAL wrapped {total_w}, skipped {total_s}")
