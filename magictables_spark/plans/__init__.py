"""Query plans package.

NOTE: do NOT re-export the ``queries``/``oracle_sql`` *functions* at
package level under their own names — ``plans.queries`` must keep
naming the submodule (a same-named re-export shadows the submodule
attribute and breaks ``from magictables_spark.plans import queries``).
"""

from magictables_spark.plans.catalog import TABLES, load_table
from magictables_spark.plans.queries import REGISTRY

__all__ = ["TABLES", "load_table", "REGISTRY"]
