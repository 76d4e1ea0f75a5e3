from tantalus_spark.compiler.q import Q, Count, Sum, Max, Min, Avg, F_ref  # noqa: F401
from tantalus_spark.compiler.compiler import QuerySet  # noqa: F401
