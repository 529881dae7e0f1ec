"""Sources and sinks: synthetic Common-Crawl-style pages generator, graph
catalog, and parquet/N-Triples IO."""
