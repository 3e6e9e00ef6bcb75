from bigdata_hits_spark.sources.readers import (
    NODES_SCHEMA,
    EDGES_BASE_SCHEMA,
    load_table,
    load_testdata,
    read_neo4j_csv,
    read_nodes_csv,
    read_edges_csv,
)
from bigdata_hits_spark.sources.bucketed import (
    read_bucketed,
    read_time_partitioned,
    write_bucketed,
    write_time_partitioned,
    write_zordered,
)

__all__ = [
    "NODES_SCHEMA",
    "EDGES_BASE_SCHEMA",
    "load_table",
    "load_testdata",
    "read_neo4j_csv",
    "read_nodes_csv",
    "read_edges_csv",
    "read_bucketed",
    "read_time_partitioned",
    "write_bucketed",
    "write_time_partitioned",
    "write_zordered",
]
