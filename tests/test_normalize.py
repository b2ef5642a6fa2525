"""Name-normalization expectations ported from the reference's
BigQueryUtilsTest.java:101-268 (pytest port mandated by SURVEY.md §5)."""

from bigquery_delta_plugins_spark.normalize import (
    get_normalized_dataset_name,
    normalize_dataset_name,
    normalize_field_name,
    normalize_table_name,
)


def test_normalization_properties_hypothesis():
    """Idempotence + closure: normalizing any unicode string yields a
    legal identifier, and normalizing twice equals normalizing once
    (the reference applies normalization per event via a cache —
    BigQueryUtils.java:271-330 — so stability under re-application is a
    required invariant)."""
    import re

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from bigquery_delta_plugins_spark.normalize import normalize_field_name

    legal = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

    @settings(max_examples=300, deadline=None)
    @given(st.text(min_size=1, max_size=40))
    def check(s):
        for flexible in (False, True):
            out = normalize_field_name(s, flexible)
            assert normalize_field_name(out, flexible) == out, (s, out)
            assert len(out) <= 300
            if not flexible:
                assert legal.match(out), (s, out)

    check()


def test_get_normalized_dataset_name():
    assert get_normalized_dataset_name("a2fs", "db2") == "a2fs"
    assert get_normalized_dataset_name(None, "db2") == "db2"
    assert get_normalized_dataset_name("", "db2") == "db2"
    assert get_normalized_dataset_name("2fas", "db2") == "2fas"
    assert get_normalized_dataset_name("ab?/c", "db?/c") == "ab_c"
    assert get_normalized_dataset_name(None, "db?/c") == "db_c"
    assert get_normalized_dataset_name("", "db?/c") == "db_c"


def test_normalize_dataset_name():
    assert normalize_dataset_name("a2fs") == "a2fs"
    assert normalize_dataset_name("2fas") == "2fas"
    name = "a1" * 512
    assert normalize_dataset_name(name) == name
    name = "a1" * 513
    assert normalize_dataset_name(name) == name[:1024]
    assert normalize_dataset_name("ab?/c") == "ab_c"
    assert normalize_dataset_name("a2 fs") == "a2_fs"
    assert normalize_dataset_name("a2-fs") == "a2_fs"


def test_normalize_table_name():
    assert normalize_table_name("a2fs") == "a2fs"
    assert normalize_table_name("2fas") == "2fas"
    name = "a1" * 512
    assert normalize_table_name(name) == name
    name = "a1" * 513
    assert normalize_table_name(name) == name[:1024]
    assert normalize_table_name("ab?c") == "ab_c"
    assert normalize_table_name("a2 fs") == "a2 fs"  # space valid in table names
    assert normalize_table_name("a2-fs") == "a2-fs"  # hyphen valid in table names


def test_normalize_field_name_default_mode():
    assert normalize_field_name("a2fs") == "a2fs"
    assert normalize_field_name("2fas") == "_2fas"
    name = "a1" * 150
    assert normalize_field_name(name) == name
    name = "1a" * 150
    assert normalize_field_name(name) == "_" + name[:299]
    name = "a1" * 151
    assert normalize_field_name(name) == name[:300]
    assert normalize_field_name("ab?/c") == "ab_c"
    assert normalize_field_name("a2 fs") == "a2_fs"


def test_normalize_field_name_flexible_mode():
    f = lambda s: normalize_field_name(s, True)  # noqa: E731
    assert f("a2-fs") == "a2-fs"
    assert f("你好世界") == "你好世界"
    assert f("こんにちは世界") == "こんにちは世界"
    assert f("👍") == "_"
    assert f("valid_") == "valid_"
    assert f("Space is valid") == "Space is valid"
    assert f("ampersand&") == "ampersand&"
    assert f("percent%") == "percent%"
    assert f("equals=") == "equals="
    assert f("plus+") == "plus+"
    assert f("colon:") == "colon:"
    assert f("apostrophe'") == "apostrophe'"
    assert f("less_than<") == "less_than<"
    assert f("greater_than>") == "greater_than>"
    assert f("number_sign#") == "number_sign#"
    assert f("vertical_line|") == "vertical_line|"
    for label, ch in [
        ("tab", "\t"), ("exclamation", "!"), ("quotation", '"'), ("dollar", "$"),
        ("left_parenthesis", "("), ("right_parenthesis", ")"), ("asterisk", "*"),
        ("comma", ","), ("period", "."), ("slash", "/"), ("semicolon", ";"),
        ("question_mark", "?"), ("at_sign", "@"), ("left_square_bracket", "["),
        ("backslash", "\\"), ("right_square_bracket", "]"),
        ("circumflex_accent", "^"), ("grave_accent", "`"),
        ("left_curly_bracket", "{"), ("right_curly_bracket", "}"), ("tilde", "~"),
    ]:
        assert f(label + ch) == label + "_", label
    assert f("mixed%valid?invalid@") == "mixed%valid_invalid_"
    assert f("a2  fs") == "a2  fs"


def test_invalid_runs_collapse_to_single_underscore():
    # Java replaceAll on a `+` pattern: a run of invalid chars -> one _
    assert normalize_dataset_name("a??b") == "a_b"
    assert normalize_field_name("a?!@b") == "a_b"
    assert normalize_table_name("a?!b") == "a_b"
