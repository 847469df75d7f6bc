from bigdata_project_spark.sources.readers import (
    load_table,
    load_tables,
    read_csv_all_string,
    read_json_array,
    register_temp,
    with_audit_columns,
)
from bigdata_project_spark.sources.sinks import (
    append_table,
    create_table_schema_only,
    drop_table,
    replace_table,
)

__all__ = [
    "load_table",
    "load_tables",
    "read_csv_all_string",
    "read_json_array",
    "register_temp",
    "with_audit_columns",
    "append_table",
    "create_table_schema_only",
    "drop_table",
    "replace_table",
]
