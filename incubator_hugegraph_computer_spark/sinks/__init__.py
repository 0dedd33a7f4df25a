from incubator_hugegraph_computer_spark.sinks.outputs import (
    log_output,
    write_csv_struct,
    write_hdfs_text,
    write_json_struct,
)

__all__ = ["write_hdfs_text", "write_csv_struct", "write_json_struct", "log_output"]
