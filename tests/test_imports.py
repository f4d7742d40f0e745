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


def test_round7_surface_importable() -> None:
    """Round-7 additions stay on the public surface."""
    from sql_autoloader_spark.connectors.spark_catalog import (  # noqa: F401
        ClaimStrategy,
        ConditionalPutClaim,
        LinkClaim,
        RenameClaim,
        SparkConnector,
    )
    from sql_autoloader_spark.functions.multimodal import (  # noqa: F401
        encode_png,
        synthesize_png,
        synthetic_png_media,
    )
    from sql_autoloader_spark.functions.scale import zorder_value  # noqa: F401
    from sql_autoloader_spark.streaming import (  # noqa: F401
        compact_signature_store,
    )

    for attr in ("recover_staging", "compact_table", "vacuum_commits",
                 "analyze_tables"):
        assert callable(getattr(SparkConnector, attr))
