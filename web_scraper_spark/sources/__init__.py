"""Sources & sinks: synthetic web fixture, fetch operator, snapshot tables."""
