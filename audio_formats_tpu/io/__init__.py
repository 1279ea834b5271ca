from .source import (
    ByteSource,
    MemorySource,
    FileSource,
    CallbackSource,
    ByteSink,
    FileSink,
)
from .bits import BitReaderMSB, BitReaderLSB, BitWriterMSB, BitWriterLSB

__all__ = [
    "ByteSource",
    "MemorySource",
    "FileSource",
    "CallbackSource",
    "ByteSink",
    "FileSink",
    "BitReaderMSB",
    "BitReaderLSB",
    "BitWriterMSB",
    "BitWriterLSB",
]
