"""Exception taxonomy for the Spark-native autoloader.

Mirrors the public error surface of the reference implementation
(/root/reference/sql_autoloader/exceptions.py:1-86) so user code that
catches these by name keeps working unchanged.
"""


class SQLAutoloaderError(Exception):
    """Base class for every error raised by this package."""


# --- DataFrame-operation errors ------------------------------------------


class MissingKeysAfterMergeError(SQLAutoloaderError):
    """A key-merge join left null values in an id column."""


class MatchDatatypesError(SQLAutoloaderError):
    """Casting database rows to the user DataFrame's dtypes failed."""


class InsertingDataFailedError(SQLAutoloaderError):
    """Post-insert verification found rows that never made it into the table."""


class CompareMissingRowsError(SQLAutoloaderError):
    """Comparison found rows in the data that the database does not contain."""


class CompareNoExactMatchError(SQLAutoloaderError):
    """Exact comparison found a mismatch between data and database row sets."""


# --- Schema errors ---------------------------------------------------------


class SchemaError(SQLAutoloaderError):
    """Base class for schema/planner errors."""


class EmptySchemaError(SQLAutoloaderError):
    """The database schema contains no tables."""


class TableDoesNotExistError(SchemaError):
    """A referenced table is not part of the schema."""


class EmptyColumnListError(SchemaError):
    """An operation received an empty column list."""


class NoSuchColumnForTableError(SchemaError):
    """A table-prefixed column does not exist on that table."""


class NoSuchColumnInSchemaError(SchemaError):
    """A column name appears nowhere in the schema."""


class ColumnsDoNotExistOnTableError(SchemaError):
    """None of the given columns exist on the target table."""


class ColumnIsAmbiguousError(SchemaError):
    """A bare column name matches more than one table."""


class NoPrimaryKeyError(SchemaError):
    """Key retrieval was requested from a table without a primary key."""


class AliasDoesNotExistError(SchemaError):
    """The requested key alias is not used by any reference in the schema."""


class AmbiguousAliasesError(SchemaError):
    """A table is referenced under several different aliases."""


class IsolatedTablesError(SchemaError):
    """Compare-query generation hit a table with no links to the rest."""


class IsolatedSubgraphsError(SchemaError):
    """Compare-query generation hit disconnected groups of tables."""


class InvalidTableError(SQLAutoloaderError):
    """Table metadata failed validation."""


class InvalidReferenceError(SQLAutoloaderError):
    """Reference metadata failed validation."""


class TransactionAbortedError(SQLAutoloaderError):
    """A COMMIT completed as ROLLBACK: an earlier error had aborted the
    transaction and the block's code swallowed it, so nothing the block
    wrote was persisted.  PostgreSQL reports this implicit rollback only
    through the CommandComplete tag; the connector checks it so success
    is never claimed for a discarded transaction."""
