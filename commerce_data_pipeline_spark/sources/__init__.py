"""Sources & sinks: schema-explicit readers and the partitioned bronze pipeline."""
