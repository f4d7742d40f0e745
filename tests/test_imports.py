"""Round-1 regression: the package must import and expose its surface.

(The round-1 snapshot shipped an ImportError in connectors/__init__ —
VERDICT.md 'What's wrong' #1.  One line of test would have caught it.)
"""


def test_package_imports() -> None:
    import sql_autoloader_spark as pkg

    for name in pkg.__all__:
        assert getattr(pkg, name) is not None


def test_connector_instantiates(spark) -> None:
    from sql_autoloader_spark import SparkConnector

    db = SparkConnector(spark)
    assert db.schema_is_empty()
