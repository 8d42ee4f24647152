"""PII detection and redaction over a documents table.

The standard pre-training scrub pass: find and mask emails, credit
cards (Luhn-validated), SSNs, phone numbers and IPv4 addresses before
a corpus is shipped to training.  Everything is built-in
`pyspark.sql.functions` — regexp_count / regexp_extract_all /
regexp_replace plus higher-order array functions — so the whole pass
is JVM-side whole-stage codegen: no Python in the hot path, no
shuffle (pure per-row projection), scales linearly with corpus bytes.

The count patterns are POSIX-safe (no lookaround, no backrefs) so the
same strings run unchanged under Java regex (Spark) and RE2 (DuckDB),
the same portability rule as `textstats.BPE_ISH_PATTERN`.  The one
exception is card extraction, which is Spark-side only anyway (Luhn
is not a regex): it wraps the POSIX core in Java lookaround
digit-boundary guards so a long identifier never donates a 19-digit
prefix as a candidate.

Card handling is two-stage because a regex cannot validate a Luhn
checksum: candidates come from `regexp_extract_all`, are checksum
-filtered with a JVM `filter()` lambda (:func:`luhn_valid_expr`),
and only the validated matches are replaced — each as a
boundary-guarded pattern inside an `aggregate()` fold — so an
invalid 16-digit number (e.g. a hash or an order id) is left alone,
and a valid card is never rewritten where it appears as a substring
of a longer non-card digit run.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Order matters for redaction: earlier kinds are replaced first, and
# the card pass runs before ssn/phone so a long digit run is consumed
# as one card, not as a phone number plus leftovers.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
#: POSIX-safe core (portable to RE2); the Spark-side extraction adds
#: Java lookaround digit-boundary guards so a 19-digit prefix of a
#: longer identifier is never taken as a candidate.
CARD_PATTERN = "[0-9](?:[ -]?[0-9]){12,18}"
_CARD_GUARDED = f"(?<![0-9])(?:{CARD_PATTERN})(?![0-9])"
SSN_PATTERN = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
PHONE_PATTERN = "(\\+?[0-9]{1,2}[ .-])?\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}"
IPV4_PATTERN = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

#: (kind, pattern, placeholder) in redaction order.
PII_KINDS: list[tuple[str, str, str]] = [
    ("email", EMAIL_PATTERN, "<EMAIL>"),
    ("card", CARD_PATTERN, "<CARD>"),
    ("ssn", SSN_PATTERN, "<SSN>"),
    ("phone", PHONE_PATTERN, "<PHONE>"),
    ("ipv4", IPV4_PATTERN, "<IP>"),
]


def luhn_valid_expr(digits: Column | str) -> Column:
    """Luhn checksum over a digits-only string column, entirely in JVM
    higher-order functions: reverse, split to chars, double every
    second digit from the right (9-subtract on overflow), sum mod 10.

    `split(s, '')` under Java regex yields one element per character
    (a trailing empty element appears on some JVM versions), so empty
    strings are filtered before the cast.  ANSI-safe: any non-digit
    character (or empty input) returns false — never a
    CAST_INVALID_INPUT throw — via `try_cast` plus an all-digits
    guard, so the public expression is safe on raw matched strings
    like '4111-1111-1111-1111' (strip separators first if you want
    those to validate).
    """
    col = F.col(digits) if isinstance(digits, str) else digits
    chars = F.filter(F.split(F.reverse(col), ""), lambda c: c != "")
    all_digits = ~F.exists(chars, lambda c: (c < "0") | (c > "9"))
    d = lambda c: c.try_cast("int")
    digit_vals = F.transform(
        chars,
        lambda c, i: F.when(
            i % 2 == 1,
            F.when(d(c) * 2 > 9, d(c) * 2 - 9).otherwise(d(c) * 2),
        ).otherwise(d(c)),
    )
    total = F.aggregate(digit_vals, F.lit(0), lambda acc, x: acc + x)
    return F.coalesce(
        (F.length(col) >= 12) & all_digits & (total % 10 == 0), F.lit(False)
    )


def _card_matches(text_col: Column) -> Column:
    """Luhn-validated card candidate strings found in `text_col`.

    Candidates are digit-boundary guarded (`_CARD_GUARDED`): a run of
    more than 19 digits yields NO candidate rather than a 19-digit
    prefix, so long identifiers/hashes can never be partially
    masked."""
    candidates = F.regexp_extract_all(text_col, F.lit(_CARD_GUARDED), 0)
    return F.filter(
        candidates,
        lambda m: luhn_valid_expr(F.regexp_replace(m, "[^0-9]", "")),
    )


def pii_counts(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII hit counts, one scan, one codegen'd projection:
    (id_col, n_email, n_card, n_ssn, n_phone, n_ipv4, has_pii).
    Works on any table with an id and a text column (e.g. transcripts:
    `pii_counts(turns, "turn_text", id_col="turn_id")`).

    n_card counts only Luhn-valid candidates — the same set
    :func:`pii_redact` would mask.
    """
    text = F.col(text_col)
    cols = []
    for kind, pattern, _ in PII_KINDS:
        if kind == "card":
            c = F.size(_card_matches(text)).cast("long")
        else:
            c = F.regexp_count(text, F.lit(pattern)).cast("long")
        cols.append(c.alias(f"n_{kind}"))
    out = docs.select(id_col, *cols)
    total = sum((F.col(f"n_{k}") for k, _, _ in PII_KINDS), F.lit(0))
    return out.withColumn("has_pii", total > 0)


def pii_findings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Long-form matches: (id_col, kind, match) — one row per hit.
    Card rows are Luhn-validated.  Useful for audit sampling; counts
    come cheaper from :func:`pii_counts`.

    ONE scan: all kinds' matches are built as (kind, match) struct
    arrays in a single projection, flattened, and exploded once — a
    per-kind union would read and regex the text column five times.
    """
    text = F.col(text_col)

    def _tag(kind: str):
        # closure factory, NOT a default arg: a two-parameter lambda
        # would make F.transform pass the array INDEX as the second
        # argument, silently shadowing the default
        return lambda m: F.struct(F.lit(kind).alias("kind"), m.alias("match"))

    arrays = []
    for kind, pattern, _ in PII_KINDS:
        matches = (
            _card_matches(text)
            if kind == "card"
            else F.regexp_extract_all(text, F.lit(pattern), 0)
        )
        arrays.append(F.transform(matches, _tag(kind)))
    return (
        docs.select(
            id_col, F.explode(F.flatten(F.array(*arrays))).alias("_hit")
        )
        .select(id_col, "_hit.kind", "_hit.match")
    )


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII hit with its typed placeholder; all other
    columns pass through, `text_col` is rewritten in place and
    `n_redactions` counts the masked hits.

    Kind order is `PII_KINDS` order: emails first, then Luhn-valid
    cards (literal `replace()` of each validated candidate inside an
    `aggregate()` fold), then ssn/phone/ipv4 regexp passes over the
    already-masked text — so an SSN inside an email address is masked
    once, as the email.
    """
    text = F.col(text_col)
    n_hits = F.lit(0).cast("long")
    for kind, pattern, placeholder in PII_KINDS:
        if kind == "card":
            matches = _card_matches(text)
            n_hits = n_hits + F.size(matches)
            # replace each validated candidate with digit-boundary
            # guards (a candidate string is [0-9 -] only, so it embeds
            # into a regex verbatim) — a literal replace() would also
            # rewrite the candidate wherever it appears as a substring
            # of a longer digit run that is NOT itself a card
            text = F.aggregate(
                matches,
                text.cast("string"),
                lambda acc, m: F.regexp_replace(
                    acc,
                    F.concat(F.lit("(?<![0-9])"), m, F.lit("(?![0-9])")),
                    F.lit(placeholder),
                ),
            )
        else:
            n_hits = n_hits + F.regexp_count(text, F.lit(pattern))
            text = F.regexp_replace(text, pattern, placeholder)
    passthrough = [c for c in docs.columns if c != text_col]
    return docs.select(
        *passthrough, text.alias(text_col), n_hits.alias("n_redactions")
    )
