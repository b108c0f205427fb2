"""End-to-end corpus pipelines composed from the verified operators."""
