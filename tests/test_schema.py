"""Planner tests — port of /root/reference/tests/test_schema.py (golden
car-sales schema, Table/Reference invariants, load-instruction and
compare-query generation).  Driver-side metadata only; no Spark needed.
"""

from __future__ import annotations

import pytest

from sql_autoloader_spark.exceptions import (
    AliasDoesNotExistError,
    ColumnIsAmbiguousError,
    ColumnsDoNotExistOnTableError,
    EmptyColumnListError,
    EmptySchemaError,
    InvalidReferenceError,
    InvalidTableError,
    NoPrimaryKeyError,
    NoSuchColumnForTableError,
    NoSuchColumnInSchemaError,
    TableDoesNotExistError,
)
from sql_autoloader_spark.schema import Reference, Schema, Table

# --- Table ------------------------------------------------------------------


def test_basic_table() -> None:
    columns = ["one", "two"]
    foreign_keys = ["one_id", "two_id"]
    table = Table(
        name="test", primary_key="id", foreign_keys=foreign_keys, columns=columns
    )
    assert table.columns_and_foreign_keys == foreign_keys + columns
    assert table.has_primary_key
    assert table.prefix_column_map == {
        f"test.{c}": c for c in columns + foreign_keys
    }
    assert not table.is_linking
    assert all(col in table for col in columns + foreign_keys)
    assert table.get_common_columns(["one"]) == ["one"]
    assert table.get_prefixed_columns(["one", "test.two"]) == [
        ("test.one", "one"),
        ("test.two", "test.two"),
    ]
    assert str(table) == "Table test (\n\tid\n\tone_id\n\ttwo_id\n\tone\n\ttwo\n)"


def test_basic_linking_table() -> None:
    table = Table(
        name="test", primary_key="id", foreign_keys=["one_id", "two_id"], columns=[]
    )
    assert table.is_linking


def test_empty_table() -> None:
    with pytest.raises(InvalidTableError):
        Table(name="", columns=[])


# --- Reference --------------------------------------------------------------


def test_basic_reference() -> None:
    reference = Reference(
        from_table="from", from_key="to_id", to_table="to", to_key="id"
    )
    assert str(reference) == "ON from.to_id = to.id"


def test_self_reference() -> None:
    with pytest.raises(InvalidReferenceError):
        Reference(from_table="from", from_key="from_id", to_table="from", to_key="id")


# --- Schema (golden car-sales DAG) ------------------------------------------

TABLES = [
    {"name": "eigenaar", "columns": ["naam"], "primary_key": "id", "foreign_keys": []},
    {"name": "merk", "columns": ["naam"], "primary_key": "id", "foreign_keys": []},
    {
        "name": "voertuig_type",
        "columns": ["naam"],
        "primary_key": "id",
        "foreign_keys": [],
    },
    {"name": "dealer", "columns": ["naam"], "primary_key": "id", "foreign_keys": []},
    {
        "name": "voertuig",
        "columns": [],
        "primary_key": "id",
        "foreign_keys": ["type_id", "merk_id"],
    },
    {
        "name": "merk_dealer",
        "columns": [],
        "primary_key": "id",
        "foreign_keys": ["dealer_id", "merk_id"],
    },
    {
        "name": "voertuig_eigenaar",
        "columns": [],
        "primary_key": "",
        "foreign_keys": ["eigenaar_id", "voertuig_id"],
    },
    {
        "name": "aankoop",
        "columns": ["datum"],
        "primary_key": "",
        "foreign_keys": ["voertuig_id", "merk_dealer_id"],
    },
]

REFERENCES = [
    {"from_table": "voertuig", "from_key": "type_id", "to_table": "voertuig_type", "to_key": "id"},
    {"from_table": "voertuig", "from_key": "merk_id", "to_table": "merk", "to_key": "id"},
    {"from_table": "merk_dealer", "from_key": "merk_id", "to_table": "merk", "to_key": "id"},
    {"from_table": "merk_dealer", "from_key": "dealer_id", "to_table": "dealer", "to_key": "id"},
    {"from_table": "voertuig_eigenaar", "from_key": "eigenaar_id", "to_table": "eigenaar", "to_key": "id"},
    {"from_table": "voertuig_eigenaar", "from_key": "voertuig_id", "to_table": "voertuig", "to_key": "id"},
    {"from_table": "aankoop", "from_key": "voertuig_id", "to_table": "voertuig", "to_key": "id"},
    {"from_table": "aankoop", "from_key": "merk_dealer_id", "to_table": "merk_dealer", "to_key": "id"},
]


@pytest.fixture
def schema() -> Schema:
    return Schema(lambda: (TABLES, REFERENCES))


def test_schema(schema: Schema) -> None:
    assert not schema.is_empty

    with pytest.raises(TableDoesNotExistError):
        schema.get_columns("trein")
    for td in TABLES:
        assert schema.get_columns(td["name"]) == td["columns"]

    with pytest.raises(TableDoesNotExistError):
        schema._get_table("trein")
    for td in TABLES:
        assert schema._get_table(td["name"]) == Table(**td)

    # column -> table reverse mapping
    mapping: dict[str, list[str]] = {}
    for td in TABLES:
        for col in td["foreign_keys"] + td["columns"]:
            mapping.setdefault(col, []).append(td["name"])
    # order within the lists is not load-bearing
    got = schema._column_table_mapping
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in mapping.items()
    }

    with pytest.raises(NoSuchColumnForTableError):
        schema._get_table_name_by_column("eigenaar.fiets")
    with pytest.raises(NoSuchColumnInSchemaError):
        schema._get_table_name_by_column("fiets")
    with pytest.raises(ColumnIsAmbiguousError):
        schema._get_table_name_by_column("naam")
    assert schema._get_table_name_by_column("eigenaar.naam") == "eigenaar"
    assert schema._get_table_name_by_column("datum") == "aankoop"

    assert schema._get_table_prefix_map("eigenaar", ["eigenaar.naam"]) == {
        "eigenaar.naam": "naam"
    }
    assert schema._get_table_prefix_map(
        "voertuig", ["voertuig.type_id", "merk_id"]
    ) == {"voertuig.type_id": "type_id"}


def test_parse_insert(schema: Schema) -> None:
    with pytest.raises(EmptyColumnListError):
        schema.parse_insert("eigenaar", [])
    with pytest.raises(ColumnsDoNotExistOnTableError):
        schema.parse_insert("eigenaar", ["fiets", "trein"])

    cases = [
        ("eigenaar", ["naam"]),
        ("merk", ["naam"]),
        ("voertuig_type", ["naam"]),
        ("dealer", ["naam"]),
        ("voertuig", ["type_id", "merk_id"]),
        ("merk_dealer", ["merk_id", "dealer_id"]),
        ("voertuig_eigenaar", ["eigenaar_id", "voertuig_id"]),
        ("aankoop", ["voertuig_id", "merk_dealer_id", "datum"]),
    ]
    for table, columns in cases:
        assert set(schema.parse_insert(table, columns)) == set(columns)


def test_parse_retrieve(schema: Schema) -> None:
    with pytest.raises(EmptyColumnListError):
        schema.parse_retrieve("eigenaar", "eigenaar_id", [])
    with pytest.raises(ColumnsDoNotExistOnTableError):
        schema.parse_retrieve("eigenaar", "eigenaar_id", ["fiets", "trein"])
    with pytest.raises(NoPrimaryKeyError):
        schema.parse_retrieve("aankoop", "aankoop_id", ["datum"])
    with pytest.raises(AliasDoesNotExistError):
        schema.parse_retrieve("eigenaar", "fiets_id", ["naam"])

    cases = [
        ("eigenaar", "eigenaar_id", ["naam"], "id"),
        ("merk", "merk_id", ["naam"], "id"),
        ("dealer", "dealer_id", ["naam"], "id"),
        ("voertuig_type", "type_id", ["naam"], "id"),
        ("voertuig", "voertuig_id", ["type_id", "merk_id"], "id"),
    ]
    for table, alias, columns, key in cases:
        out_key, out_columns = schema.parse_retrieve(table, alias, columns)
        assert out_key == key
        assert set(out_columns) == set(columns)


def test_get_load_instructions(schema: Schema) -> None:
    """Golden plan (reference tests/test_schema.py:424-459)."""
    columns = [
        "eigenaar.naam",
        "voertuig_type.naam",
        "merk.naam",
        "dealer.naam",
        "datum",
    ]
    plan = schema.get_load_instructions(columns)
    assert isinstance(repr(plan), str)
    assert plan.insert_and_retrieve == [
        {"table": "eigenaar", "alias": "eigenaar_id", "columns": {"eigenaar.naam": "naam"}},
        {"table": "merk", "alias": "merk_id", "columns": {"merk.naam": "naam"}},
        {"table": "voertuig_type", "alias": "type_id", "columns": {"voertuig_type.naam": "naam"}},
        {"table": "dealer", "alias": "dealer_id", "columns": {"dealer.naam": "naam"}},
        {"table": "voertuig", "alias": "voertuig_id", "columns": {}},
        {"table": "merk_dealer", "alias": "merk_dealer_id", "columns": {}},
    ]
    assert plan.insert == [
        {"table": "voertuig_eigenaar", "columns": {}},
        {"table": "aankoop", "columns": {}},
    ]


def test_get_compare_query(schema: Schema) -> None:
    """Golden compare query (reference tests/test_schema.py:490-492)."""
    columns = [
        "voertuig_type.naam",
        "eigenaar.naam",
        "merk.naam",
        "dealer.naam",
        "datum",
    ]
    golden = (
        'SELECT\naankoop.datum as "datum",\ndealer.naam as "dealer.naam",\n'
        'eigenaar.naam as "eigenaar.naam",\nmerk.naam as "merk.naam",\n'
        'voertuig_type.naam as "voertuig_type.naam"\n'
        "FROM voertuig_type\n"
        "LEFT JOIN voertuig ON voertuig.type_id = voertuig_type.id\n"
        "LEFT JOIN merk ON voertuig.merk_id = merk.id\n"
        "LEFT JOIN merk_dealer ON merk_dealer.merk_id = merk.id\n"
        "LEFT JOIN dealer ON merk_dealer.dealer_id = dealer.id\n"
        "LEFT JOIN aankoop ON aankoop.voertuig_id = voertuig.id\n"
        "LEFT JOIN voertuig_eigenaar ON voertuig_eigenaar.voertuig_id = voertuig.id\n"
        "LEFT JOIN eigenaar ON voertuig_eigenaar.eigenaar_id = eigenaar.id"
    )
    assert schema.get_compare_query(columns, quote='"') == golden


def test_empty_schema() -> None:
    schema = Schema(lambda: ([], []))
    assert schema.is_empty
    with pytest.raises(EmptySchemaError):
        schema.check_schema_not_empty()
