"""End-to-end Ray Data pipelines: ingest (decode → envelope / apply)."""
