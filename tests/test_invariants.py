"""Property-style invariants mirrored from the reference:

- output length monotonic in budget and <= budget (or the minimal k=1
  render when nothing fits)            (tests/monotonicity.rs:24-61)
- strict-JSON output parses at every budget (tests/e2e_json_parse.rs)
- budget-0 minimal outputs             (tests/budget_zero.rs)
- kept + omitted == total in JS array comments (tests/array_caps.rs:49-56)
"""

from __future__ import annotations

import json
import re
from pathlib import Path

import pytest

from headson_ray.core.cli import CliOptions, run_stdin

EXPLICIT = Path("/root/reference/tests/fixtures/explicit")
PARAMETRIC = Path("/root/reference/tests/fixtures/parametric")

TEMPLATES = {
    "json": ("json", "strict"),
    "pseudo": ("json", "default"),
    "js": ("json", "detailed"),
}


def _run(data: bytes, tmpl: str, budget: int) -> str:
    fmt, style = TEMPLATES[tmpl]
    return run_stdin(CliOptions(budget=budget, format=fmt, style=style), data)


def _trimmed_len(s: str) -> int:
    return len(s.rstrip("\r\n"))


@pytest.mark.parametrize("tmpl", ["json", "pseudo", "js"])
@pytest.mark.parametrize(
    "fixture,budgets",
    [
        ("object_small.json", [0, 1, 5, 10, 20, 50, 100, 1000]),
        ("array_numbers_50.json", [0, 1, 5, 10, 20, 30, 60, 120]),
        ("string_escaping.json", [0, 1, 5, 10, 40, 80, 200]),
    ],
)
def test_monotonic_and_within_budget(tmpl, fixture, budgets):
    data = (EXPLICIT / fixture).read_bytes()
    lens = [_trimmed_len(_run(data, tmpl, b)) for b in budgets]
    for a, b in zip(lens, lens[1:]):
        assert b >= a, (lens, budgets)
    min_len = lens[0]
    for ln, b in zip(lens, budgets):
        if min_len <= b:
            assert ln <= b, (ln, b, tmpl, fixture)
        else:
            assert ln == min_len, (ln, min_len, b, tmpl, fixture)


@pytest.mark.parametrize(
    "fixture", sorted(p.name for p in PARAMETRIC.glob("*.json"))
)
@pytest.mark.parametrize("budget", [10, 50, 100, 250, 1000, 10000])
def test_strict_json_always_parses(fixture, budget):
    data = (PARAMETRIC / fixture).read_bytes()
    out = _run(data, "json", budget)
    json.loads(out)  # must be valid JSON at every budget


@pytest.mark.parametrize("tmpl", ["json", "pseudo", "js"])
@pytest.mark.parametrize(
    "text,expected_min",
    [
        ("[]", "[]"),
        ("{}", "{}"),
        ('"x"', '"…"'),
        ("0", "0"),
        ("true", "true"),
        ("null", "null"),
    ],
)
def test_budget_zero_minimal(tmpl, text, expected_min):
    # reference table: tests/budget_zero.rs:4-27
    out = _run(text.encode(), tmpl, 0)
    assert out == expected_min


def test_js_comment_counts_add_up():
    # detailed template: the TRAILING omission comment counts total
    # omitted, so kept + trailing_omitted == total (tests/array_caps.rs)
    n_items = 50
    data = json.dumps(list(range(n_items))).encode()
    out = _run(data, "js", 60)
    comments = re.findall(r"/\* (\d+) more items \*/", out)
    assert comments, out
    omitted = int(comments[-1])
    kept = len(re.findall(r"^\s+\d+,?$", out, re.M))
    assert kept + omitted == n_items, out


# --- unicode grapheme truncation (tests/unicode_strings.rs) ----------------

UNICODE_CASES = [
    ("unicode_emoji_skin_tone.json", 2, "👍🏽👍🏽…"),
    ("unicode_zwj_family.json", 1, "👨‍👩‍👧‍👦…"),
    ("unicode_combining.json", 2, "éé…"),
    ("unicode_flags.json", 2, "🇺🇳🇺🇳…"),
]


@pytest.mark.parametrize("tmpl", ["json", "pseudo", "js"])
@pytest.mark.parametrize("fixture,cap,expected", UNICODE_CASES)
def test_unicode_grapheme_truncation(tmpl, fixture, cap, expected):
    from headson_ray.core.cli import CliOptions, run_stdin

    data = (EXPLICIT / fixture).read_bytes()
    fmt, style = TEMPLATES[tmpl]
    out = run_stdin(
        CliOptions(budget=1000, format=fmt, style=style, string_cap=cap),
        data,
    )
    assert json.loads(out) == expected, (tmpl, fixture)
