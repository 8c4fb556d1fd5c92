"""Pure-Python grok compiler unit tests (SURVEY.md §5.2 layer 1,
FIXTURES.md §A3 grok rows). No Spark."""

import pandas as pd
import pytest

from logspark.grok import GrokCompiler, GrokError, compile_grok

TOOL_LINE = '[2024-03-01T12:00:05Z] INFO tool=search latency_ms=142 status=ok msg="hello world"'
TOOL_PAT = (
    r"\[%{TIMESTAMP_ISO8601:log_ts}\] %{LOGLEVEL:level} tool=%{WORD:tool_name} "
    r'latency_ms=%{INT:latency_ms:int} status=%{WORD:status} msg="%{DATA:msg}"'
)


def test_match_all_captures():
    g = GrokCompiler().compile(TOOL_PAT)
    out = g.match(TOOL_LINE)
    assert out == {
        "log_ts": "2024-03-01T12:00:05Z",
        "level": "INFO",
        "tool_name": "search",
        "latency_ms": 142,
        "status": "ok",
        "msg": "hello world",
    }


def test_typed_capture_int_coercion():
    g = GrokCompiler().compile(r"n=%{INT:n:int} f=%{NUMBER:f:float}")
    out = g.match("n=-7 f=3.25")
    assert out == {"n": -7, "f": 3.25}
    assert isinstance(out["n"], int)
    assert isinstance(out["f"], float)


def test_no_match_returns_none():
    g = GrokCompiler().compile(TOOL_PAT)
    assert g.match("free text that is not a log line") is None
    assert g.match(None) is None


def test_anchored_rejects_mid_string_hit():
    g = GrokCompiler().compile(r"level=%{LOGLEVEL:level}")
    assert g.match("level=ERROR rest") == {"level": "ERROR"}
    # same content mid-string must NOT match (north star: anchored regexes)
    assert g.match("prefix level=ERROR") is None


def test_anchor_both_requires_full_match():
    g = GrokCompiler().compile(r"%{WORD:w}", anchor="both")
    assert g.match("hello") == {"w": "hello"}
    assert g.match("hello world") is None


def test_unknown_pattern_raises():
    with pytest.raises(GrokError, match="unknown grok pattern"):
        GrokCompiler().compile(r"%{NOPE:x}")


def test_cycle_detection():
    c = GrokCompiler({"A": "%{B}", "B": "%{A}"})
    with pytest.raises(GrokError, match="cycle"):
        c.compile(r"%{A:a}")


def test_custom_pattern_library_entry():
    c = GrokCompiler({"TOOLNAME": r"[a-z_]+"})
    g = c.compile(r"tool=%{TOOLNAME:t}")
    assert g.match("tool=code_exec") == {"t": "code_exec"}


def test_duplicate_semantic_names_allowed():
    # same semantic in two alternations — python regex would reject duplicate
    # named groups; our sanitized g<N> groups must not collide
    g = GrokCompiler().compile(r"%{WORD:w} %{WORD:w2}")
    assert g.match("a b") == {"w": "a", "w2": "b"}


def test_first_match_wins_across_patterns():
    cg = compile_grok(
        [r"a=%{INT:v:int}%{GREEDYDATA}", r"%{INT:v2:int}%{GREEDYDATA}"]
    )
    df = cg.extract_pandas(pd.Series(["a=1 x", "2 y", "zzz"]))
    assert df["_grok_matched"].tolist() == [True, True, False]
    assert df["v"].tolist()[0] == 1 and pd.isna(df["v"].iloc[1])
    assert df["v2"].tolist()[1] == 2 and pd.isna(df["v2"].iloc[0])


def test_extract_pandas_vectorized_matches_scalar():
    cg = compile_grok([TOOL_PAT])
    s = pd.Series([TOOL_LINE, "free text", None, TOOL_LINE.replace("142", "9")])
    df = cg.extract_pandas(s)
    assert df["_grok_matched"].tolist() == [True, False, False, True]
    assert df["latency_ms"].dtype.name == "Int64"
    assert df["latency_ms"].tolist()[0] == 142
    assert df["latency_ms"].tolist()[3] == 9
    assert pd.isna(df["latency_ms"].iloc[1]) and pd.isna(df["msg"].iloc[2])
    assert df["msg"].iloc[0] == "hello world"


def test_bad_typed_capture_leaves_field_unset():
    # DATA accepts non-numeric text; :int coercion must null it, not raise
    cg = compile_grok([r"v=%{DATA:v:int}$"], anchor="start")
    df = cg.extract_pandas(pd.Series(["v=12", "v=xx"]))
    assert df["_grok_matched"].tolist() == [True, True]
    assert df["v"].tolist()[0] == 12
    assert pd.isna(df["v"].iloc[1])


def test_compile_cache_identity():
    a = compile_grok([TOOL_PAT])
    b = compile_grok([TOOL_PAT])
    assert a is b


def test_commonapachelog():
    g = GrokCompiler().compile(r"%{COMMONAPACHELOG}")
    line = '10.1.2.3 - - [11/Feb/2024:09:15:32 +0000] "GET /idx.html HTTP/1.1" 200 5120'
    out = g.match(line)
    assert out["clientip"] == "10.1.2.3"
    assert out["verb"] == "GET"
    assert out["request"] == "/idx.html"
    assert out["response"] == 200
    assert out["bytes"] == 5120


# ---------------------------------------------------------------------------
# JVM-native emission (compile_grok_java) — pure-Python checks, no Spark
# ---------------------------------------------------------------------------

def test_java_emission_positional_groups():
    from logspark.grok import compile_grok_java
    import re as _re

    jp = compile_grok_java([r"tool=%{WORD:tool} ms=%{INT:ms:int}"])
    assert jp is not None and len(jp) == 1
    caps = {c.name: c for c in jp[0].captures}
    assert caps["tool"].gidx == 1 and caps["ms"].gidx == 2
    assert caps["ms"].type == "int"
    # every emitted regex carries the UNIX_LINES flag so Java '.'/'^'/'$'
    # treat only \n as a line terminator (Python/RE2 parity, ADVICE r2)
    assert jp[0].regex.startswith("(?d)")
    # past the Java-only flag, the emitted regex is also valid Python
    # (shared subset) — verify the positional indices really line up
    m = _re.compile(jp[0].regex.removeprefix("(?d)")).search("tool=search ms=42")
    assert m and m.group(1) == "search" and m.group(2) == "42"


def test_java_emission_counts_plain_user_groups():
    from logspark.grok import compile_grok_java
    import re as _re

    # a plain (non-grok) capturing group before the semantic one must shift
    # the semantic group's positional index
    jp = compile_grok_java([r"(ab|cd) v=%{INT:v:int}"])
    assert jp is None or jp[0].captures[0].gidx == 2
    # (alternation INSIDE the plain group is fine; the semantic capture is
    # outside it, so this pattern is eligible)
    assert jp is not None
    m = _re.compile(jp[0].regex.removeprefix("(?d)")).search("ab v=7")
    assert m and m.group(jp[0].captures[0].gidx) == "7"


def test_java_emission_rejects_unsafe():
    from logspark.grok import compile_grok_java

    assert compile_grok_java([r"x(?:%{INT:k:int})?"]) is None  # optional capture
    assert compile_grok_java([r"(?:a%{INT:k:int}|b)"]) is None  # alternated capture
    assert compile_grok_java([r"{bad %{INT:k:int}"]) is None  # dangling literal {
    # \2 = the (x) group once the compiler's outer wrapper shifts indices
    assert compile_grok_java([r"(x)\2 %{INT:k:int}"]) is None  # backreference
    # quantified-but-mandatory enclosing group is fine
    assert compile_grok_java([r"(?:%{INT:k:int}){1}"]) is not None
    # literal-first-']' character classes ('[]x]' / '[^]x]') are valid Python
    # but Java rejects them and the class scanner would end the class early,
    # shifting group indices — they must take the pandas path (ADVICE r2)
    assert compile_grok_java([r"[]x]%{INT:k:int}"]) is None
    assert compile_grok_java([r"[^]x]%{INT:k:int}"]) is None
