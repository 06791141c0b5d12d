"""Selection-rule golden tests (SURVEY §7 M0): ``a%`` ⇒ {accounts, authors},
``novels`` ⇒ {novels}, ``%`` ⇒ all — reference dms_sample/stack.py:100-113,
124-137, 317-328."""

from sample_dms_kinesis_rds_mariadb_spark.spec import (
    SelectionRule,
    like_match,
    select_tables,
)

TABLES = [("testdb", "authors"), ("testdb", "accounts"), ("testdb", "novels")]


def test_a_percent_selects_authors_accounts():
    rules = [SelectionRule("testdb", "a%")]
    assert select_tables(TABLES, rules) == [
        ("testdb", "accounts"),
        ("testdb", "authors"),
    ]


def test_exact_selects_novels():
    rules = [SelectionRule("testdb", "novels")]
    assert select_tables(TABLES, rules) == [("testdb", "novels")]


def test_percent_selects_all():
    rules = [SelectionRule("%", "%")]
    assert select_tables(TABLES, rules) == sorted(TABLES)


def test_schema_scoping_excludes_other_schemas():
    rules = [SelectionRule("testdb", "%")]
    tables = TABLES + [("otherdb", "authors")]
    assert select_tables(tables, rules) == sorted(TABLES)


def test_exclude_rule_vetoes():
    rules = [SelectionRule("testdb", "%"), SelectionRule("testdb", "a%", "exclude")]
    assert select_tables(TABLES, rules) == [("testdb", "novels")]


def test_underscore_wildcard():
    assert like_match("novel_", "novels")
    assert not like_match("novel_", "novel")
    assert like_match("a%", "accounts")
    assert not like_match("a%", "novels")
    # literal regex chars must not leak through
    assert not like_match("a.c", "abc")
