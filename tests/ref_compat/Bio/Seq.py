class Seq(str):
    """Plain-string Seq; the analyzer only str()s it."""
