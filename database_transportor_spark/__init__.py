"""database_transportor_spark — a PySpark-native rebuild of the
`Wimpy-Kid/database-transportor` declarative cross-database migration engine,
extended with large-scale data-pipeline operators (dedup, similarity search,
text analysis, streaming aggregation).

Core API::

    from database_transportor_spark import DBT, ParquetCatalog

    engine = DBT(maps, target=ParquetCatalog(spark, out_dir),
                 original=ParquetCatalog(spark, src_dir))
    engine.do_transport()
"""

from .engine import DBT
from .operators.pins import release_pins
from .session import build_session
from .spec import SpecError, parse_maps
from .sources.catalog import (
    Catalog,
    FileCatalog,
    JDBCCatalog,
    MemoryCatalog,
    ParquetCatalog,
    TableCatalog,
)

__all__ = [
    "DBT",
    "build_session",
    "release_pins",
    "SpecError",
    "parse_maps",
    "Catalog",
    "FileCatalog",
    "JDBCCatalog",
    "MemoryCatalog",
    "ParquetCatalog",
    "TableCatalog",
]

__version__ = "0.1.0"
