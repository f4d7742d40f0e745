"""The schema DAG and the load planner.

Semantics parity with /root/reference/sql_autoloader/schema.py:237-745:
same graph shape (edge parent -> child so a topological order yields
referenced tables before referencing tables), same plan-splitting rule,
same compare-query path construction.  This is all driver-side metadata
work over O(#tables) nodes — it never sees data, so there is nothing to
distribute; the Spark cluster only runs the plans this module emits.
"""

from __future__ import annotations

import networkx as nx

from sql_autoloader_spark._itertools import (
    dedupe_consecutive,
    first_seen,
    pairwise_windows,
    sorted_unique,
)
from sql_autoloader_spark.exceptions import (
    AliasDoesNotExistError,
    AmbiguousAliasesError,
    ColumnIsAmbiguousError,
    ColumnsDoNotExistOnTableError,
    EmptyColumnListError,
    EmptySchemaError,
    IsolatedSubgraphsError,
    IsolatedTablesError,
    NoPrimaryKeyError,
    NoSuchColumnForTableError,
    NoSuchColumnInSchemaError,
    TableDoesNotExistError,
)
from sql_autoloader_spark.schema.model import (
    GetSchemaFunction,
    LoadInstructions,
    Reference,
    Table,
)


class Schema:
    """A database schema as a DAG of tables, plus the planning algorithms.

    Nodes carry :class:`Table` payloads; an edge ``parent -> child`` exists
    for every reference ``child.fk -> parent.pk``, so topological order is
    valid load order.
    """

    graph: nx.DiGraph

    def __init__(self, get_schema: GetSchemaFunction) -> None:
        self.graph = nx.DiGraph()
        table_dicts, reference_dicts = get_schema()

        for td in table_dicts:
            table = Table(**td)
            self.graph.add_node(table.name, table=table)

        for rd in reference_dicts:
            ref = Reference(**rd)
            if ref.to_table not in self.graph.nodes:
                msg = (
                    f"Reference target '{ref.to_table}' is not a known table. "
                    f"Check: on table '{ref.from_table}', "
                    f"{ref.from_key} REFERENCES {ref.to_table} ({ref.to_key})."
                )
                raise TableDoesNotExistError(msg)
            # parent -> child, so referenced tables sort first
            self.graph.add_edge(ref.to_table, ref.from_table, reference=ref)

        if not nx.is_directed_acyclic_graph(self.graph):
            msg = "Schema contains a reference cycle; only DAG schemas are supported."
            raise AssertionError(msg)

    # -- lookups -------------------------------------------------------------

    def _get_table(self, table_name: str) -> Table:
        if table_name not in self.graph.nodes:
            msg = f"table '{table_name}' does not appear in schema."
            raise TableDoesNotExistError(msg)
        return self.graph.nodes[table_name]["table"]

    @property
    def _column_table_mapping(self) -> dict[str, list[str]]:
        """Reverse index: bare column name -> tables carrying it (cached)."""
        cached = getattr(self, "_ctm_cache", None)
        if cached is None:
            cached = {}
            for name in self.graph.nodes:
                for col in self._get_table(name).columns_and_foreign_keys:
                    cached.setdefault(col, []).append(name)
            self._ctm_cache = cached
        return cached

    @property
    def _topological_sort(self) -> list[str]:
        cached = getattr(self, "_topo_cache", None)
        if cached is None:
            cached = list(nx.topological_sort(self.graph))
            self._topo_cache = cached
        return cached

    def _get_table_name_by_column(self, column_name: str) -> str:
        """Resolve a (possibly ``table.column``-prefixed) column to its table."""
        if "." in column_name:
            table_name, _ = column_name.split(".", 1)
            table = self._get_table(table_name)
            if column_name not in table:
                msg = f"Column '{column_name}' does not exist for {table_name}."
                raise NoSuchColumnForTableError(msg)
            return table.name

        if column_name not in self._column_table_mapping:
            msg = (
                f"No column named '{column_name}' appears anywhere in the schema. "
                "Note: primary keys cannot be set directly."
            )
            raise NoSuchColumnInSchemaError(msg)

        tables = self._column_table_mapping[column_name]
        if len(tables) > 1:
            msg = (
                f"Column name '{column_name}' is ambiguous; it appears on tables "
                f"'{tables}'. Prefix it as <table>.<column>."
            )
            raise ColumnIsAmbiguousError(msg)
        return tables[0]

    def _get_table_prefix_map(
        self, table_name: str, columns: list[str]
    ) -> dict[str, str]:
        """Subset of the table's prefix map restricted to *columns*."""
        table = self._get_table(table_name)
        return {
            pfx: bare
            for pfx, bare in table.prefix_column_map.items()
            if pfx in columns
        }

    def _get_relevant_tables(self, columns: list[str]) -> list[str]:
        """Tables addressed by *columns*, plus the closure of linking tables.

        A linking table (keys only) joins the set as soon as *all* of its
        parents are in; walking the whole-graph topological order lets
        chains of linking tables resolve in one pass.  Base table order is
        alphabetical (sorted-unique), which fixes plan and SELECT ordering.
        """
        tables = sorted_unique(
            self._get_table_name_by_column(col) for col in columns
        )
        for node in self._topological_sort:
            if node in tables or not self._get_table(node).is_linking:
                continue
            parents = list(self.graph.predecessors(node))
            if parents and all(p in tables for p in parents):
                tables.append(node)
        return tables

    def _parse_columns(self, table: Table, columns: list[str]) -> list[str]:
        if len(columns) == 0:
            msg = "Provided list of columns cannot be empty"
            raise EmptyColumnListError(msg)
        if not any(col in table for col in columns):
            msg = (
                f"None of '{columns}' exist in table '{table.name}'. "
                f"Table schema is:\n{table}"
            )
            raise ColumnsDoNotExistOnTableError(msg)
        return table.get_common_columns(columns)

    # -- public surface --------------------------------------------------------

    @property
    def is_empty(self) -> bool:
        return len(self.graph.nodes) == 0

    def check_schema_not_empty(self) -> None:
        if self.is_empty:
            msg = "Database does not contain any tables."
            raise EmptySchemaError(msg)

    def get_columns(self, table_name: str) -> list[str]:
        """Payload (non-key) columns of a table."""
        return self._get_table(table_name).columns

    def get_load_instructions(self, columns: list[str]) -> LoadInstructions:
        """Split the relevant tables into insert+retrieve vs insert-only steps.

        A table needs its surrogate keys read back iff it has a primary key
        *and* some table in the same plan references it; the retrieval alias
        is the ``from_key`` those references use (required to be unique).
        """
        tables = self._get_relevant_tables(columns)
        subgraph = nx.subgraph(self.graph, tables)

        insert_and_retrieve: list[dict] = []
        insert_only: list[dict] = []

        for table in nx.topological_sort(subgraph):
            params: dict = {
                "table": table,
                "columns": self._get_table_prefix_map(table, columns),
            }
            children = list(subgraph.successors(table))
            if self._get_table(table).has_primary_key and children:
                aliases = []
                for child in children:
                    attr = self.graph.get_edge_data(table, child)
                    ref = None if attr is None else attr.get("reference")
                    if ref is not None:
                        aliases.append(ref.from_key)
                if not aliases:
                    msg = f"No reference aliases found for keyed table '{table}' with children {children}."
                    raise AssertionError(msg)
                if len(sorted_unique(aliases)) > 1:
                    msg = (
                        f"Table '{table}' is referred to by multiple aliases: "
                        f"'{aliases}'; which to use is ambiguous. Use one consistent "
                        "alias or load manually."
                    )
                    raise AmbiguousAliasesError(msg)
                params["alias"] = aliases[0]
                insert_and_retrieve.append(params)
            else:
                insert_only.append(params)

        return LoadInstructions(
            insert_and_retrieve=insert_and_retrieve, insert=insert_only
        )

    def get_compare_query(
        self,
        columns: list[str],
        *,
        where: str | None = None,
        quote: str = '"',
    ) -> str:
        """Generate the flat LEFT-JOIN query that reconstructs loaded data.

        Join order: the longest path through the relevant DAG is the spine;
        each table the spine misses is spliced in as an out-and-back loop
        along the shortest undirected path, preferring the splice target
        whose path covers the most missing tables.  The emitted SQL is
        dialect-neutral except for identifier quoting (``quote``): the
        reference dialects use double quotes, Spark SQL uses backticks.

        Physical note (Spark): the spine walks dim → fact, so every join
        is dim-preserving LeftOuter with the bigger relation on the right
        — a shape whose left (dim) side cannot be a broadcast build side.
        ``SparkConnector`` therefore enables AQE's SMJ→shuffled-hash
        conversion so the runtime builds the dim-side hash map instead of
        sorting the fact (see spark_catalog.py); the SQL itself stays
        dialect-neutral.
        """
        where_clause = f"\n{where}" if where is not None else ""

        tables = self._get_relevant_tables(columns)
        subgraph = nx.subgraph(self.graph, tables)

        if len(tables) > 1 and nx.number_of_isolates(subgraph) > 0:
            isolated = [n for n in subgraph.nodes if nx.is_isolate(subgraph, n)]
            msg = (
                f"Automatic compare-query generation cannot handle isolated tables, "
                f"but '{isolated}' do not link to any other table within '{tables}'. "
                "Provide a compare query yourself, or disable comparison."
            )
            raise IsolatedTablesError(msg)

        if len(tables) > 1:
            components = list(nx.weakly_connected_components(subgraph))
            if len(components) > 1:
                msg = (
                    "Automatic compare-query generation cannot handle isolated "
                    f"subgraphs; found weakly connected components: '{components}'"
                )
                raise IsolatedSubgraphsError(msg)

        select_pairs = [
            pair
            for table in tables
            for pair in self._get_table(table).get_prefixed_columns(columns)
        ]
        select_lines = [
            f"{prefixed} as {quote}{alias}{quote}" for prefixed, alias in select_pairs
        ]

        if len(tables) == 1:
            join_clause = f"\nFROM {tables[0]}"
        else:
            undirected = subgraph.to_undirected()
            path = nx.dag_longest_path(subgraph)
            if not path:
                msg = "only found an empty base path."
                raise AssertionError(msg)

            for table in tables:
                if table in path:
                    continue
                reachable = {
                    target: p
                    for target, p in nx.shortest_path(undirected, table).items()
                    if target in path
                }
                if not reachable:
                    msg = "No valid node-paths found."
                    raise AssertionError(msg)
                # splice at the target whose path picks up the most missing tables
                target = sorted(
                    reachable,
                    key=lambda t: sum(n not in path for n in reachable[t]),
                    reverse=True,
                )[0]
                at = path.index(target) + 1
                loop = list(reversed(reachable[target])) + reachable[target]
                path[at:at] = loop
                path = dedupe_consecutive(path)

            if not nx.is_path(undirected, path):
                msg = "Adding missing tables resulted in an invalid path."
                raise AssertionError(msg)

            references = first_seen(
                undirected.get_edge_data(u, v)["reference"]
                for u, v in pairwise_windows(path)
            )
            join_tables = first_seen(path)
            join_lines = [
                f"LEFT JOIN {table} {ref}"
                for table, ref in zip(join_tables[1:], references)
            ]
            join_clause = f"\nFROM {join_tables[0]}\n" + "\n".join(join_lines)

        select_clause = "SELECT\n" + ",\n".join(select_lines)
        return select_clause + join_clause + where_clause

    def parse_insert(self, table_name: str, columns: list[str]) -> list[str]:
        """Validate an insert target; return the columns data and table share."""
        return self._parse_columns(self._get_table(table_name), columns)

    def parse_retrieve(
        self, table_name: str, alias: str, columns: list[str]
    ) -> tuple[str, list[str]]:
        """Validate a key-retrieval; return ``(primary_key, common_columns)``."""
        table = self._get_table(table_name)
        if not table.has_primary_key:
            msg = (
                f"Table '{table_name}' does not have a primary key; "
                "retrieving ids from it makes no sense."
            )
            raise NoPrimaryKeyError(msg)

        edges = list(self.graph.edges(table_name))
        if not edges:
            msg = f"Table '{table_name}' has a primary key but no outgoing references."
            raise AssertionError(msg)

        known_aliases = sorted_unique(
            self.graph.get_edge_data(*edge)["reference"].from_key for edge in edges
        )
        if alias not in known_aliases:
            msg = f"Alias '{alias}' does not appear anywhere in the schema for table '{table_name}'."
            raise AliasDoesNotExistError(msg)

        return table.primary_key, self._parse_columns(table, columns)

    def __str__(self) -> str:
        return "\n".join(
            str(self.graph.nodes[n]["table"]) for n in self.graph.nodes
        )
