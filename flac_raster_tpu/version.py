__version__ = "0.3.0"

# Version string written into FLAC VORBIS_COMMENT ENCODER fields.
ENCODER_NAME = f"flac-raster-tpu v{__version__}"
