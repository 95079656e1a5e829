from .writers import write_tsv, write_silver, write_jdbc  # noqa: F401
