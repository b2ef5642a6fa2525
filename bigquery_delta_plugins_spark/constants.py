"""Audit / metadata column names shared by staging batches and target tables.

Mirrors the reference's column-name contract
(reference: src/main/java/io/cdap/delta/bigquery/Constants.java:23-30).
"""

SEQUENCE_NUM = "_sequence_num"
SOURCE_TIMESTAMP = "_source_timestamp"
IS_DELETED = "_is_deleted"
ROW_ID = "_row_id"
OPERATION = "_op"
BATCH_ID = "_batch_id"
SORT_KEYS = "_sort"
SORT_KEY_FIELD = "_key"
BEFORE_PREFIX = "_before_"
# Optional staging column marking initial-snapshot events; the consumer
# direct-loads the snapshot portion of a batch and merges the rest,
# mirroring the reference's SNAPSHOT/STREAMING blob split
# (MultiGCSWriter.java:73-76, BigQueryEventConsumer.java:697-753).
SNAPSHOT = "_snapshot"

# DML operation values carried in the _op column
OP_INSERT = "INSERT"
OP_UPDATE = "UPDATE"
OP_DELETE = "DELETE"
# Control-plane marker: a DDL event riding INLINE in the event stream
# (the reference receives DDL in the one ordered event stream,
# BigQueryEventConsumer.java:297-335).  A DDL row carries the serialized
# event in DDL_PAYLOAD and its sequence point in _sequence_num; all data
# columns are NULL.
OP_DDL = "DDL"
DDL_PAYLOAD = "_ddl"

# Event-stream ordering contract of the source
ORDERED = "ORDERED"
UN_ORDERED = "UN_ORDERED"

# Reference operational constants (BigQueryEventConsumer.java:251-254,
# BigQueryTarget.java:80,373-375) kept for parity in config defaults.
MAX_CLUSTERING_COLUMNS = 4
MAX_TABLES_PER_MAX_SEQ_QUERY = 1000
DEFAULT_LOAD_INTERVAL_SECONDS = 90
