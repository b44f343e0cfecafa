__version__ = "0.1.0"

# Version string the reference binary reports (src/main.c:7); the CLI's
# stderr epilogue mirrors the reference's format with our own version.
REFERENCE_VERSION = "0.7.23-r15"
