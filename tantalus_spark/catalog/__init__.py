from tantalus_spark.catalog.relations import (  # noqa: F401
    ForeignKey,
    ManyToMany,
    OneToOne,
    RelationshipCatalog,
    Step,
)
from tantalus_spark.catalog.loader import Database, load_dir  # noqa: F401
