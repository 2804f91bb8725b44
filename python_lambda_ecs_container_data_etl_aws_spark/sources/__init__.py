"""Ingest spine: schema registry, filename routing, CSV canonical
projection, quarantine, chunking, merge — the reference's leader/loader
lambdas re-expressed as declarative Spark transforms."""
