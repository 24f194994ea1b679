"""Rounding-tie audit: structurally forbid the r6 hazard class.

Round-6 background: the only two driver hash-reds ever recorded traced
to oracles that rounded CONTINUOUS data (products of 2-decimal fixed
point) at a scale where exact .5 ties occur — DuckDB rounds doubles
HALF_UP while Spark rounds half-even, so every tie diverges. The r7 fix
rewrote the affected oracles tie-free and added the `x_round_ties`
canary pinning each engine's tie direction.

This module makes the hazard class *mechanically* detectable instead of
grep-checked per round: :func:`instrument` rewrites every
``round(expr[, k])`` call site in an oracle's SQL into

    CASE WHEN abs(fmod(abs(expr) * 10^k, 1.0) - 0.5) < 1e-9
         THEN error('rounding tie ...')
         ELSE round(expr, k) END

so that *running* the instrumented oracle on real fixture data raises
the moment any rounded value sits on (or within 1e-9 of) a .5 tie. The
test in tests/test_oracle_types.py sweeps all registered oracles at
sf0.001 — a NEW oracle that rounds continuous data at a tie-prone scale
fails CI before it can reach the driver.

Why empirical rather than static: whether ``round(x, 2)`` is hazardous
depends on x's value lattice (2-dec data times 2-dec data ties at e2;
the same expression over integers never does). Executing against the
fixture answers the question the grammar can't.

What counts as a hazard — SNAPPED ties, not genuine ones. The engines
round a double two different ways:

- Spark (java BigDecimal HALF_UP) rescales the EXACT binary value of
  the double — no precision is lost before the tie test.
- DuckDB (std::round(value * 10^k) / 10^k) multiplies first — and that
  double multiply can SNAP a value sitting within half an ulp of X.5
  onto exactly X.5 (0.34500000000000003 * 100 == 34.5 bit-for-bit).
  DuckDB then rounds the snapped tie UP while Spark, seeing the exact
  value below the tie, rounds DOWN. That snap is the r6
  x_bucketed_join divergence (2-dec x 2-dec products end on the e2
  lattice's .5).

So the test is an error-free transformation: split the operand with
Dekker's algorithm and recover the exact residual err of E*10^k. Then

- f == 0.5 and err == 0  ->  a GENUINE dyadic tie (jaccard = k/128 at
  e6, 0.125 at e2). Both engines see the same exact value and both
  round half-away-from-zero — safe, pinned by `x_round_ties`. ~30
  long-green oracles tie exactly like this; flagging them would be
  false positives.
- f == 0.5 and err != 0  ->  a SNAPPED tie: DuckDB rounds the snapped
  .5, Spark rounds the true value on the other side. HAZARD.
- f within TOL of 0.5 but not equal  ->  conservative guard band for
  multi-step expression paths that differ between the engines.

`x_round_ties` itself rounds deliberate ties by design and is
whitelisted by the caller.
"""

from __future__ import annotations

import re

_ROUND = re.compile(r"\bround\s*\(", re.IGNORECASE)

#: Tie band half-width in scaled (post *10^k) space. Wide enough to
#: catch fixed-point lattice ties that double arithmetic smears by a
#: few ulps, narrow enough that continuous values essentially never
#: land inside it by chance.
TOL = 1e-9


def _split_top_level(s: str) -> list[str]:
    """Split on commas at paren depth 0 (string-literal aware)."""
    parts, depth, start, i, n = [], 0, 0, 0, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                # '' is an escaped quote inside a literal
                if i + 1 < n and s[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
        elif c == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _find_close(s: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx."""
    depth, i, n = 0, open_idx, len(s)
    in_str = False
    while i < n:
        c = s[i]
        if in_str:
            if c == "'":
                if i + 1 < n and s[i + 1] == "'":
                    i += 1
                else:
                    in_str = False
        elif c == "'":
            in_str = True
        elif c == "(":
            depth += 1
        elif c == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    raise ValueError("unbalanced parentheses")


def instrument(sql: str, label: str = "oracle") -> tuple[str, int]:
    """Rewrite every round() call site into a tie-erroring CASE.

    Returns (rewritten_sql, n_sites). Inner round() calls nested inside
    an outer round's argument are rewritten too (innermost semantics
    preserved — the canary wraps each site independently).
    """
    out, pos, sites = [], 0, 0
    in_str = False  # literal state carried across the scan (r9 ADVICE:
    # the regex alone would rewrite a round( inside a VARCHAR literal)
    while True:
        m = _ROUND.search(sql, pos)
        if m is None:
            out.append(sql[pos:])
            break
        # replay quote parity over the skipped span; '' escapes a quote
        j = pos
        while j < m.start():
            if sql[j] == "'":
                if in_str and j + 1 < len(sql) and sql[j + 1] == "'":
                    j += 1
                else:
                    in_str = not in_str
            j += 1
        if in_str:
            out.append(sql[pos:m.end()])
            pos = m.end()
            continue
        open_idx = m.end() - 1
        close_idx = _find_close(sql, open_idx)
        inner = sql[m.end():close_idx]
        args = _split_top_level(inner)
        expr = args[0]
        scale = args[1].strip() if len(args) > 1 else "0"
        # Recurse into the argument so nested rounds get their own canary.
        expr_rw, n_inner = instrument(expr, label)
        sites += n_inner + 1
        out.append(sql[pos:m.start()])
        # Dekker error-free product needs 10^k exactly representable
        # and split-friendly: literal non-negative scales up to 15 only
        # (every oracle uses 0..6 today). Anything else falls back to
        # the guard band alone.
        try:
            k = int(scale)
            exact_split = 0 <= k <= 15
        except ValueError:
            exact_split = False
        a = f"abs(CAST(({expr_rw}) AS DOUBLE))"
        # fmod(x, 1.0) is meaningless once x >= 2^53 (ulp >= 2): the
        # guard cannot see ties there, so FLAG scaled operands leaving
        # its domain instead of silently passing (r9 ADVICE). k = 0 is
        # exempt: a double >= 2^53 is already an integer, round() is
        # the identity and no tie can exist.
        dom = "FALSE"
        if exact_split:
            s = float(10 ** k)
            if k > 0:
                dom = f"(({a}) * {s} >= 9007199254740992.0)"
            # Dekker split of A (C = 2^27 + 1); S is a power of ten
            # <= 1e15 so its own split is (S, 0) and drops out.
            eh = f"(({a}) * 134217729.0 - (({a}) * 134217729.0 - ({a})))"
            err = (f"((({eh}) * {s} - ({a}) * {s}) "
                   f"+ (({a}) - ({eh})) * {s})")
            f_ = f"fmod(({a}) * {s}, 1.0)"
            hazard = (f"(({f_} = 0.5 AND {err} <> 0.0) OR "
                      f"({f_} <> 0.5 AND abs({f_} - 0.5) < {TOL}))")
        else:
            sc = f"pow(10.0, ({scale}))"
            dom = f"(({a}) * {sc} >= 9007199254740992.0 AND ({scale}) > 0)"
            f_ = f"fmod(({a}) * {sc}, 1.0)"
            hazard = f"({f_} <> 0.5 AND abs({f_} - 0.5) < {TOL})"
        hazard = f"({hazard} OR {dom})"
        out.append(
            f"(CASE WHEN {hazard} "
            f"THEN CAST(error('rounding near-tie in {label}: round(..., "
            f"{scale}) lands on a .5 the exact value does not sit on "
            f"(snap divergence: DuckDB multiply-then-round vs Spark "
            f"exact rescale) — use a tie-free fixed-point key "
            f"(x_round_ties / round-workflow rule 10)') AS DOUBLE) "
            f"ELSE round(({expr_rw}), ({scale})) END)")
        pos = close_idx + 1
    return "".join(out), sites
