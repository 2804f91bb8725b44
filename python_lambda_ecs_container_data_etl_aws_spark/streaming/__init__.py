"""Structured Streaming runner: the reference's S3→SQS→Lambda
micro-batch loop re-expressed as a checkpointed file-source stream."""
