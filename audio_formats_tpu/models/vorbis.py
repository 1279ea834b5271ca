"""Placeholder for the vorbis codec — implemented in a later milestone."""

def probe(src):
    return None
