"""Port of the reference's randomized end-to-end simulation
(/root/reference/tests/test_sqlite_connector.py:288-446 with
tests/generators.py): random DAG → random DDL + flat data → ``load`` →
generated compare query → round-trip equality.

Spark adaptations: names are lowercase (Spark SQL identifiers are
case-insensitive, the reference's mixed-case names would collide),
example count is bounded (each example is a full Spark load), and the
round-trip check compares row sets via ``collect`` instead of polars
``assert_frame_equal``.
"""

from __future__ import annotations

import string
from collections import Counter
from dataclasses import dataclass

import hypothesis.strategies as st
import networkx as nx
import pytest
from hypothesis import HealthCheck, assume, given, settings
from pyspark.sql import SparkSession

from sql_autoloader_spark.connectors.spark_catalog import SparkConnector
from sql_autoloader_spark.exceptions import EmptySchemaError

LETTERS = string.ascii_lowercase
# SQL keywords and Spark reserved-ish names to dodge
NOT_ALLOWED = {"null", "table", "set", "if", "then", "else", "not", "exists",
               "and", "or", "order", "group", "select", "from", "where", "all",
               "as", "by", "in", "is", "on", "to", "use", "end", "for", "int",
               # SQLite keywords (the same scenarios drive the sqlite sink)
               "check", "index", "union", "values", "into", "create", "drop",
               "unique", "primary", "key", "default", "join", "left", "right",
               "inner", "outer", "limit", "when", "case", "cast", "like"}


@st.composite
def names_generator(
    draw: st.DrawFn, min_size: int = 3, max_size: int = 5
) -> list[str]:
    return draw(
        st.lists(
            st.text(LETTERS, min_size=3, max_size=5),
            min_size=min_size,
            max_size=max_size,
            unique=True,
        )
    )


@st.composite
def dag_generator(
    draw: st.DrawFn, nodes: list[str], *, no_isolates: bool = False
) -> nx.DiGraph:
    """Random DAG via a strictly-lower-triangular random adjacency matrix."""
    n = len(nodes)
    graph = nx.DiGraph()
    graph.add_nodes_from(nodes)
    for i in range(n):
        for j in range(i):
            if draw(st.booleans()):
                graph.add_edge(nodes[j], nodes[i])
    assume(nx.is_directed_acyclic_graph(graph))
    if no_isolates:
        assume(nx.number_of_isolates(graph) == 0)
        assume(len(list(nx.weakly_connected_components(graph))) == 1)
    return graph


@dataclass
class Scenario:
    ddl: str
    rows: list[dict]
    columns: list[str]
    no_isolates: bool


@st.composite
def scenario(draw: st.DrawFn) -> Scenario:
    no_isolates = draw(st.booleans())
    table_names = draw(names_generator(min_size=3, max_size=6))
    assume(all(t not in NOT_ALLOWED for t in table_names))
    graph = draw(dag_generator(table_names, no_isolates=no_isolates))

    ddl_parts: list[str] = []
    primary_keys: dict[str, str] = {}
    payload: dict[str, list[str]] = {}
    all_columns: list[str] = []

    for table in nx.topological_sort(graph):
        successors = list(graph.successors(table))
        predecessors = list(graph.predecessors(table))

        pk = 1 if successors else draw(st.booleans())
        num_cols = max(1, pk + 1)
        cols = [
            f"_{c}" for c in draw(names_generator(num_cols, num_cols + 2))
        ]
        assume(all(c not in NOT_ALLOWED for c in cols))

        primary_key = ""
        if pk:
            primary_key, cols = cols[0], cols[1:]
            primary_keys[table] = primary_key

        defs = []
        if primary_key:
            defs.append(f"{primary_key} INTEGER PRIMARY KEY")
        defs += [
            f"{pred}_id INTEGER REFERENCES {pred} ({primary_keys[pred]})"
            for pred in predecessors
        ]
        defs += [f"{col} TEXT" for col in cols]
        ddl_parts.append(f"CREATE TABLE {table} ({', '.join(defs)});")
        payload[table] = cols
        all_columns += cols

    freq = Counter(all_columns)
    column_names = [
        f"{t}.{c}" if freq[c] > 1 else c
        for t in payload
        for c in payload[t]
    ]
    assume(column_names)

    n_rows = draw(st.integers(3, 5))
    n = len(column_names)
    values = [str(v) for v in range(n * n_rows)]
    rows = [
        dict(zip(column_names, values[i * n : (i + 1) * n]))
        for i in range(n_rows)
    ]
    return Scenario("\n".join(ddl_parts), rows, column_names, no_isolates)


@pytest.mark.slow
@settings(
    max_examples=3,  # r16: suite wall-time budget (derandomized stream)  # r16: suite wall-time budget (derandomized stream)
    deadline=None,
    # deterministic example stream: CI/driver reruns must not flake on a
    # novel draw — widen coverage deliberately by bumping max_examples
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(sc=scenario())
def test_random_dag_roundtrip(spark: SparkSession, sc: Scenario) -> None:
    data = spark.createDataFrame(
        sc.rows, ", ".join(f"`{c}` string" for c in sc.columns)
    )

    db = SparkConnector(spark)
    db.expose_reconstruction = True
    with pytest.raises(EmptySchemaError):
        db.load(data)

    db.execute_ddl(sc.ddl)
    if sc.no_isolates:
        with db:
            db.load(data, compare=True, exact=False)
        compare_query = db.schema.get_compare_query(sc.columns, quote="`")
        # quote: prefix-disambiguated columns contain dots, which a bare
        # string select would parse as table.column
        quoted = [f"`{c}`" for c in sc.columns]
        db_rows = {
            tuple(r) for r in spark.sql(compare_query).select(quoted).collect()
        }
        in_rows = {tuple(r) for r in data.select(quoted).collect()}
        assert in_rows <= db_rows, (
            f"round-trip lost rows\nquery:\n{compare_query}"
        )
        # the pinned reconstruction must equal the freshly-executed
        # generated compare query on every random schema
        rec = db.last_reconstruction
        assert rec is not None
        rec_rows = {tuple(r) for r in rec.select(quoted).collect()}
        assert rec_rows == db_rows, (
            f"pinned reconstruction diverged\nquery:\n{compare_query}"
        )
    else:
        with db:
            db.load(data, compare=False)


@pytest.mark.slow
@settings(
    max_examples=4,  # r16: suite wall-time budget (derandomized stream)
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(sc=scenario())
def test_random_dag_roundtrip_sqlite(spark: SparkSession, sc: Scenario) -> None:
    """The same randomized scenarios against the LIVE SQLite sink — the
    reference's own end-to-end simulation on a real database (reference
    tests/test_sqlite_connector.py:334-446): real DDL, real autoincrement
    keys, and the generated compare query executed by SQLite."""
    from sql_autoloader_spark.connectors.sqlite import SQLiteConnector

    data = spark.createDataFrame(
        sc.rows, ", ".join(f"`{c}` string" for c in sc.columns)
    )
    db = SQLiteConnector(spark)
    db.execute_ddl(sc.ddl)
    quoted = [f"`{c}`" for c in sc.columns]
    if sc.no_isolates:
        with db:
            db.load(data, compare=True, exact=False)
        compare_query = db.schema.get_compare_query(sc.columns, quote='"')
        db_rows = {
            tuple(r)
            for r in db._execute_compare_query(compare_query)
            .select(quoted)
            .collect()
        }
        in_rows = {tuple(r) for r in data.select(quoted).collect()}
        assert in_rows <= db_rows, (
            f"round-trip lost rows\nquery:\n{compare_query}"
        )
    else:
        with db:
            db.load(data, compare=False)
    db.close()


@pytest.mark.slow
@settings(
    max_examples=3,  # r16: suite wall-time budget (derandomized stream)
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(sc=scenario())
def test_random_dag_evolution_roundtrip(
    spark: SparkSession, sc: Scenario
) -> None:
    """Schema evolution on the random-DAG corpus: after a full load,
    ALTER a random table to add a payload column, re-load data widened
    with it, and the generated compare round-trip must still hold —
    the planner, key merge, and reconstruction all see the new column."""
    import re

    assume(sc.no_isolates)
    data = spark.createDataFrame(
        sc.rows, ", ".join(f"`{c}` string" for c in sc.columns)
    )
    db = SparkConnector(spark)
    db.execute_ddl(sc.ddl)
    with db:
        db.load(data, compare=True, exact=False)

    table = re.search(r"CREATE TABLE (\w+)", sc.ddl).group(1)
    db.execute_ddl(f"ALTER TABLE {table} ADD COLUMN _evo_col TEXT")
    assert "_evo_col" in db.schema.get_columns(table)

    widened_cols = sc.columns + ["_evo_col"]
    widened_rows = [
        {**row, "_evo_col": f"evo{i}"} for i, row in enumerate(sc.rows)
    ]
    widened = spark.createDataFrame(
        widened_rows, ", ".join(f"`{c}` string" for c in widened_cols)
    )
    with db:
        db.load(widened, compare=True, exact=False)
    compare_query = db.schema.get_compare_query(widened_cols, quote="`")
    quoted = [f"`{c}`" for c in widened_cols]
    db_rows = {
        tuple(r) for r in spark.sql(compare_query).select(quoted).collect()
    }
    in_rows = {tuple(r) for r in widened.select(quoted).collect()}
    assert in_rows <= db_rows, (
        f"evolved round-trip lost rows\nquery:\n{compare_query}"
    )


@pytest.mark.slow
@settings(
    max_examples=3,  # r16: suite wall-time budget (derandomized stream)
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(sc=scenario())
def test_random_dag_adoption_differential(
    spark: SparkSession, sc: Scenario
) -> None:
    """Cross-catalog adoption on the random-DAG corpus: load each
    random schema through a managed database, then reopen the SAME
    warehouse location under a fresh catalog name (what a new process
    sees) — the adopted connector must reconstruct identical table
    metadata from the persisted JSON alone, read identical content,
    and accept an idempotent re-load that adds nothing."""
    import tempfile
    import uuid

    data = spark.createDataFrame(
        sc.rows, ", ".join(f"`{c}` string" for c in sc.columns)
    )
    tag = uuid.uuid4().hex[:8]
    loc = tempfile.mkdtemp(prefix="adoptdiff_")
    spark.sql(f"CREATE DATABASE wa_{tag} LOCATION '{loc}/wh.db'")
    writer = SparkConnector(spark, database=f"wa_{tag}")
    writer.execute_ddl(sc.ddl)
    with writer:
        writer.load(data, compare=False)

    spark.sql(f"CREATE DATABASE wb_{tag} LOCATION '{loc}/wh.db'")
    adopted = SparkConnector(spark, database=f"wb_{tag}")
    assert adopted._meta == writer._meta  # full ParsedTable parity
    for t in writer._meta:
        want = {tuple(r) for r in writer._read_table(t).collect()}
        got = {tuple(r) for r in adopted._read_table(t).collect()}
        assert got == want, t

    pre = {t: adopted._read_table(t).count() for t in writer._meta}
    with adopted:
        adopted.load(data, compare=False)
    for t in writer._meta:
        # adopted's own committed view refreshes at commit, so a
        # duplicated insert would show here (the writer's pinned view
        # would not — it predates the re-load)
        assert adopted._read_table(t).count() == pre[t], t
