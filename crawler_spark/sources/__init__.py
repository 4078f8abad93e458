"""Sources & sinks: synthetic corpus generator, versioned table IO."""
