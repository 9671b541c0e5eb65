"""Sources/sinks: pages-table synthesis and the TableIO seam."""
