from mission_data_pipeline_spark.models.ccsds import (
    CCSDS_SYNC_MARKER,
    PRIMARY_HEADER_LEN,
    CCSDSPrimaryHeader,
)
from mission_data_pipeline_spark.models.schemas import (
    PACKET_SCHEMA,
    PARAMS_SCHEMA,
    FRAME_SCHEMA,
)

__all__ = [
    "CCSDS_SYNC_MARKER",
    "PRIMARY_HEADER_LEN",
    "CCSDSPrimaryHeader",
    "PACKET_SCHEMA",
    "PARAMS_SCHEMA",
    "FRAME_SCHEMA",
]
