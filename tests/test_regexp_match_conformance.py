"""Conformance pins from the reference's own regexp-filter corpus
(lib/filter/tests/test_filters_regexp.c) through RegexpParser with
store-matches semantics: $0/$1..$n/named-group values, LMF_DUPNAMES,
and the invalid-pattern compile-error list."""
import re

import pyarrow as pa
import pytest

from axosyslog_ray.stages.regexp_parser import RegexpParser

# (message, regexp, name, expected value) — test_filter_regexp_backref_chk
BACKREF_CASES = [
    ("al fa", r"(a)(l) (fa)", "1", "a"),
    ("al fa", r"(a)(l) (fa)", "0", "al fa"),
    ("al fa", r"(a)(l) (fa)", "232", None),
    ("alma fa", r"(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "MM", "m"),
    ("alma fa", r"(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa>fa)", "aaaa", None),
    ("alma fa", r"(?P<a>a)(?P<l>l)(?P<MM>m)(?P<aa>a) (?P<fa_name>fa)", "fa_name", "fa"),
    ("al fa", r"(a)(l) (fa)", "2", "l"),
    ("al fa", r"(a)(l) (fa)", "3", "fa"),
    ("foobar bar", r"(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "bar", "bar"),
    ("foobar bar", r"(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foobar", "foobar"),
    ("foobar bar", r"(?<foobar>foobar) (?<foo>foo)?(?<bar>bar)", "foo", None),
    ("abc", r"((a))", "1", "a"),
    ("abc", r"((a))", "2", "a"),
    ("ab", r"(a+|b)*", "1", "b"),
    ("ab", r"(a+|b){0,}", "1", "b"),
    ("ab", r"(a+|b)+", "1", "b"),
    ("ab", r"(a+|b){1,}", "1", "b"),
    ("ab", r"(a+|b)?", "1", "a"),
    ("ab", r"(a+|b){0,1}", "1", "a"),
    ("abbbcd", r"([abc])*d", "1", "c"),
    ("abcd", r"([abc])*bcd", "1", "a"),
    ("xabyabbbz", r"ab*", "0", "ab"),
    ("xayabbbz", r"ab*", "0", "a"),
    ("abcdef", r"(abc|)ef", "0", "ef"),
    ("abcd", r"(a|b)c*d", "1", "b"),
    ("abc", r"(ab|ab*)bc", "1", "a"),
    ("abc", r"a([bc]*)c*", "1", "bc"),
    ("abcd", r"a([bc]*)(c*d)", "2", "d"),
    ("abcd", r"a([bc]+)(c*d)", "2", "d"),
    ("abcd", r"a([bc]*)(c+d)", "2", "cd"),
    ("alpha", r"[a-zA-Z_][a-zA-Z0-9_]*", "0", "alpha"),
    ("abh", r"^a(bc+|b[eh])g|.h$", "1", None),
    ("effgz", r"(bc+d$|ef*g.|h?i(j|k))", "1", "effgz"),
    ("effgz", r"(bc+d$|ef*g.|h?i(j|k))", "2", None),
    ("ij", r"(bc+d$|ef*g.|h?i(j|k))", "1", "ij"),
    ("ij", r"(bc+d$|ef*g.|h?i(j|k))", "2", "j"),
    ("reffgz", r"(bc+d$|ef*g.|h?i(j|k))", "1", "effgz"),
    ("reffgz", r"(bc+d$|ef*g.|h?i(j|k))", "2", None),
    ("a", r"((((((((((a))))))))))", "10", "a"),
    ("aa", r"((((((((((a))))))))))\10", "0", "aa"),
    ("abcde", r"(.*)c(.*)", "1", "ab"),
    ("abcde", r"(.*)c(.*)", "2", "de"),
    ("(a, b)", r"\((.*), (.*)\)", "1", "a"),
    ("(a, b)", r"\((.*), (.*)\)", "2", "b"),
    ("abcabc", r"(abc)\1", "1", "abc"),
    ("abcabc", r"([a-c]*)\1", "1", "abc"),
    ("a:bc-:de:f", r"(?<!-):(.*?)(?<!-):", "1", "bc-:de"),
    ("A", r"(?i)(?:(?:(?:(?:(?:(?:(?:(?:(?:(a))))))))))", "1", "A"),
    ("C", r"(?i)(?:(?:(?:(?:(?:(?:(?:(?:(?:(a|b|c))))))))))", "1", "C"),
    ("ace", r"a(?:b|c|d)(.)", "1", "e"),
    ("ace", r"a(?:b|c|d)*(.)", "1", "e"),
    ("ace", r"a(?:b|c|d)+?(.)", "1", "e"),
    ("ace", r"a(?:b|(c|e){1,2}?|d)+?(.)", "1", "c"),
    ("ace", r"a(?:b|(c|e){1,2}?|d)+?(.)", "2", "e"),
]

DUPNAME_CASES = [
    ("hello foo", r"(?<DN>foo)|(?<DN>bar)", "DN", "foo"),
    ("hello bar", r"(?<DN>foo)|(?<DN>bar)", "DN", "bar"),
    ("foobar", r"(?<DN>foo)(?<DN>bar)", "DN", "bar"),
]

# create_pcre_regexp_filter / _match invalid patterns -> compile error
INVALID_PATTERNS = [
    "((", "(?iana", "(?P<foo_123", "(?P<1>a)", "(?P<!>a)", "(?P<foo!>a)",
    r"\1", "a[b-a]", "a[]b", "a[", "*a", "(*)b", "a\\", "abc)", "(abc",
    "a**", ")(", r"(?<DN>foo)|(?<DN>bar)",  # dup names WITHOUT the flag
]


def _extract(msg, pattern, name, dupnames=False):
    p = RegexpParser(pattern, source_col="message", emit_matches=True,
                     dupnames=dupnames)
    t = p(pa.table({"message": pa.array([msg], type=pa.string())}))
    row = t.to_pylist()[0]
    assert row["re_matched"] is True
    if name.isdigit():
        idx = int(name)
        if idx == 0:
            return row["match0"]
        lst = row["matches"] or []
        return lst[idx - 1] if idx - 1 < len(lst) else None
    return row.get(name)


@pytest.mark.parametrize("msg,pattern,name,value", BACKREF_CASES)
def test_backref_values(msg, pattern, name, value):
    assert _extract(msg, pattern, name) == value


@pytest.mark.parametrize("msg,pattern,name,value", DUPNAME_CASES)
def test_dupnames_last_set_group_wins(msg, pattern, name, value):
    assert _extract(msg, pattern, name, dupnames=True) == value


@pytest.mark.parametrize("pattern", INVALID_PATTERNS)
def test_invalid_patterns_fail_compile(pattern):
    with pytest.raises(re.error):
        RegexpParser(pattern, source_col="message")
