from .file_source import (  # noqa: F401
    csv_file_source,
    file_source,
    json_file_source,
    kafka_source_options,
    transcripts_source,
)
