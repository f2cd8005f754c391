"""Protocol lint for rounded-double comparisons (round-8, after the
q_bollinger_bands driver hash FAIL).

The repo's parity protocol (SURVEY §4, plans/queries.py header) bans
feeding a ``round(<double expr>, k)`` result into a COMPARISON or an
integer cast: Spark rounds the exact binary value of the double
(BigDecimal HALF_UP) while DuckDB scales by 10^k first, so a value
whose binary expansion sits within ~ulp(x * 10^k) of a .5*10^-k grid
point rounds differently — and a comparison then flips a whole
boolean/rank, not just the last hashed digit. That is exactly how
q_bollinger_bands failed CORRECTNESS_r07 (rows+schema matched, values
diverged).

Output-only roundings are governed by the continuous-valued rule: for
a continuous-valued double x, P(divergence) per row is about
ulp(x * 10^k) / (0.5 * 10^-k * 10^k) — negligible when the rounded
value carries few significant digits (|x| * 10^k small), and material
when it carries many (the bollinger sigma was ~9 significant digits).

This lint statically enumerates every round(expr, k>=1) site in every
registered oracle (the Spark expressions mirror the SQL 1:1 by the
parity convention, so the SQL side enumerates both) and flags sites
where the rounded result feeds a comparison operator, an ORDER BY
(top-k rank boundary), another round(), or an integer CAST — either
directly or through its column alias. Each flagged site must carry a
whitelist entry with a written justification (bounded magnitude under
the continuous-valued rule, or exact-representability argument), so
any NEW rounded-comparison site fails tests/test_round_protocol.py
until it is converted to the integer protocol or justified here.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

_CMP_AFTER = re.compile(r"^\s*(>=|<=|<>|!=|=|>|<|\bBETWEEN\b|\bIN\b)",
                        re.IGNORECASE)
_CMP_BEFORE = re.compile(r"(>=|<=|<>|!=|=|>|<|\bBETWEEN\b|\bAND\b\s*$)\s*$")
_ORDER_BEFORE = re.compile(r"ORDER\s+BY\s*[^()]*$", re.IGNORECASE)
_AS_ALIAS = re.compile(r"^\s*AS\s+(\w+)", re.IGNORECASE)
_CAST_INT_BEFORE = re.compile(r"CAST\s*\(\s*$", re.IGNORECASE)


def _find_round_calls(sql: str):
    """Yield (start, end, inner, k) for round(<inner>, <k>) with k>=1,
    paren-balanced. end is the index just past the closing paren."""
    for m in re.finditer(r"\bround\s*\(", sql, re.IGNORECASE):
        depth = 1
        i = m.end()
        while i < len(sql) and depth:
            if sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
            i += 1
        body = sql[m.end():i - 1]
        # split top-level comma
        depth = 0
        split = None
        for j, ch in enumerate(body):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            elif ch == "," and depth == 0:
                split = j
        if split is None:
            continue  # round(x) to integer: blessed protocol
        karg = body[split + 1:].strip()
        if not re.fullmatch(r"\d+", karg) or int(karg) < 1:
            continue
        yield m.start(), i, body[:split].strip(), int(karg)


def _alias_feeds_comparison(sql: str, alias: str) -> list[str]:
    """Occurrences of alias (outside its AS definition) adjacent to a
    comparison / integer-cast / round / arithmetic-into-round context."""
    hits = []
    for m in re.finditer(rf"\b{re.escape(alias)}\b", sql):
        before = sql[max(0, m.start() - 48):m.start()]
        after = sql[m.end():m.end() + 48]
        if re.search(rf"AS\s+$", before, re.IGNORECASE):
            continue  # the definition site
        ctx = None
        if _CMP_AFTER.search(after):
            ctx = f"cmp-after: ...{alias}{after[:24]!r}"
        elif re.search(r"(>=|<=|<>|!=|>|<)\s*$", before):
            ctx = f"cmp-before: {before[-24:]!r}{alias}..."
        elif re.search(r"round\s*\(\s*[^()]*$", before, re.IGNORECASE):
            ctx = f"re-round: {before[-32:]!r}{alias}"
        elif re.search(r"CAST\s*\(\s*$", before, re.IGNORECASE) and \
                re.search(r"^\s*AS\s+(BIGINT|INT|INTEGER|SMALLINT)",
                          after, re.IGNORECASE):
            ctx = f"int-cast: CAST({alias} AS INT...)"
        if ctx:
            hits.append(ctx)
    return hits


def lint_oracles(oracles: dict[str, str]) -> dict[str, list[dict]]:
    """Return {query_name: [finding, ...]} for every rounded-double
    site whose result feeds a comparison/rank/int-cast."""
    findings: dict[str, list[dict]] = {}
    for name, sql in oracles.items():
        out = []
        for start, end, inner, k in _find_round_calls(sql):
            before = sql[max(0, start - 64):start]
            after = sql[end:end + 64]
            contexts = []
            if _CMP_AFTER.search(after):
                contexts.append("direct-cmp-after")
            if re.search(r"(>=|<=|<>|!=|>|<)\s*$", before):
                contexts.append("direct-cmp-before")
            if _ORDER_BEFORE.search(before):
                contexts.append("order-by-rank")
            if _CAST_INT_BEFORE.search(before) and re.search(
                    r"^\s*AS\s+(BIGINT|INT|INTEGER)", after, re.IGNORECASE):
                contexts.append("int-cast")
            am = _AS_ALIAS.match(after)
            if am:
                contexts += _alias_feeds_comparison(sql, am.group(1))
            if contexts:
                out.append({
                    "expr": re.sub(r"\s+", " ", inner)[:96],
                    "k": k,
                    "contexts": contexts,
                })
        if out:
            findings[name] = out
    return findings


if __name__ == "__main__":
    from document_parsing_etl_pipeline_spark.plans.queries import ORACLES

    findings = lint_oracles(ORACLES)
    for name, items in sorted(findings.items()):
        for it in items:
            print(f"{name}: round(..., {it['k']}) "
                  f"[{'; '.join(it['contexts'])}] expr={it['expr']}")
    print(f"\n{sum(len(v) for v in findings.values())} flagged sites "
          f"in {len(findings)} queries")
