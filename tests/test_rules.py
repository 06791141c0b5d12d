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


def test_unsigned_integer_types_widen():
    """Unsigned MariaDB integers widen one level (same-width signed would
    overflow past the signed max and cast to NULL — silent corruption);
    display widths like 'int(10) unsigned' normalize away first."""
    from pyspark.sql import types as T

    from sample_dms_kinesis_rds_mariadb_spark.streaming.schema_evolution import (
        mariadb_type_to_spark,
    )

    assert mariadb_type_to_spark("smallint unsigned") == T.IntegerType()
    assert mariadb_type_to_spark("int unsigned") == T.LongType()
    assert mariadb_type_to_spark("integer unsigned") == T.LongType()
    assert mariadb_type_to_spark("int(10) unsigned") == T.LongType()
    assert mariadb_type_to_spark("bigint(20) unsigned") == T.DecimalType(20, 0)
    assert mariadb_type_to_spark("tinyint unsigned") == T.ShortType()
    # signed forms unchanged
    assert mariadb_type_to_spark("int") == T.IntegerType()
    assert mariadb_type_to_spark("bigint") == T.LongType()
    assert mariadb_type_to_spark("tinyint(1)") == T.BooleanType()
