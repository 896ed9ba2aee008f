"""Ray Data stages: decode actor pool, envelope, apply, sinks."""
