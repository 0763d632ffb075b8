# minimal Biopython shim: just enough for janitor.biology.join_fasta, which
# only reads `x.id` and `str(x.seq)` from SeqIO.parse(filename, "fasta")
# (reference biology.py:75-77). FASTA framing per the format spec: '>' headers,
# id = first whitespace-delimited token, sequence = concatenated body lines.
