class _Rec:
    def __init__(self, header, lines):
        self.id = header.split()[0] if header.split() else ""
        self.description = header
        self.seq = "".join(lines)


def parse(filename, fmt):
    assert fmt == "fasta", f"shim supports fasta only, got {fmt}"
    header, lines = None, []
    with open(filename) as fh:
        for raw in fh:
            line = raw.rstrip("\n").rstrip("\r")
            if line.startswith(">"):
                if header is not None:
                    yield _Rec(header, lines)
                header, lines = line[1:], []
            elif line and header is not None:
                lines.append(line.strip())
    if header is not None:
        yield _Rec(header, lines)
