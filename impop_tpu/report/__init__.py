from impop_tpu.report.tables import (
    format_pica_output,
    pi_table_header,
    hfst_row,
    HFST_HEADER,
    FST3PI_HEADER,
    TAJD_HEADER,
)

__all__ = [
    "format_pica_output",
    "pi_table_header",
    "hfst_row",
    "HFST_HEADER",
    "FST3PI_HEADER",
    "TAJD_HEADER",
]
