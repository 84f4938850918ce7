"""Sources and sinks: graph export, table IO."""
