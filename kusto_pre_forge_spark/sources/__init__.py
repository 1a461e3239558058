from kusto_pre_forge_spark.sources.blob import (
    list_source,
    read_blobs_via_paths,
    read_landing,
    read_xz_lines,
    read_zip_lines,
)
from kusto_pre_forge_spark.sources.autoextract import read_text_auto
from kusto_pre_forge_spark.sources.docx import read_docx
from kusto_pre_forge_spark.sources.ipynb import read_ipynb
from kusto_pre_forge_spark.sources.pdf import read_pdf
from kusto_pre_forge_spark.sources.warc import read_warc

__all__ = [
    "list_source",
    "read_blobs_via_paths",
    "read_landing",
    "read_xz_lines",
    "read_zip_lines",
    "read_docx",
    "read_text_auto",
    "read_ipynb",
    "read_pdf",
    "read_warc",
]
