#!/usr/bin/env python3
"""ISO-2709 -> marc-in-json converter (dev tool for test fixtures).

Implements the public ISO 2709 / MARC21 record framing: 24-byte leader
(bytes 0-4 record length, 12-16 base address), 12-byte directory entries
(3 tag + 4 length + 5 offset) terminated by 0x1E, field data at the base
address, subfields delimited by 0x1F, field terminator 0x1E, record
terminator 0x1D.
"""
import sys, json

FT, RT, SD = b"\x1e", b"\x1d", b"\x1f"

def parse_records(data: bytes):
    pos = 0
    while pos < len(data):
        while pos < len(data) and data[pos] in (0x1d, 0x0a, 0x0d, 0x20, 0x00):
            pos += 1
        if pos + 24 > len(data):
            break
        leader = data[pos:pos+24]
        try:
            reclen = int(leader[0:5])
        except ValueError:
            break
        record = data[pos:pos+reclen]
        pos += reclen
        yield parse_record(record)

def parse_record(rec: bytes):
    leader = rec[0:24].decode("utf-8", "replace")
    base = int(rec[12:17])
    dir_end = rec.index(FT)
    directory = rec[24:dir_end]
    fields = []
    for i in range(0, len(directory) - 11, 12):
        entry = directory[i:i+12]
        tag = entry[0:3].decode("ascii", "replace")
        flen = int(entry[3:7]); start = int(entry[7:12])
        raw = rec[base+start : base+start+flen].rstrip(FT)
        if tag < "010":
            fields.append({tag: raw.decode("utf-8", "replace")})
        else:
            ind1 = raw[0:1].decode("utf-8", "replace") or " "
            ind2 = raw[1:2].decode("utf-8", "replace") or " "
            subfields = []
            for chunk in raw[2:].split(SD):
                if not chunk:
                    continue
                code = chunk[0:1].decode("utf-8", "replace")
                subfields.append({code: chunk[1:].decode("utf-8", "replace")})
            fields.append({tag: {"ind1": ind1, "ind2": ind2, "subfields": subfields}})
    return {"leader": leader, "fields": fields}

if __name__ == "__main__":
    for rec in parse_records(open(sys.argv[1], "rb").read()):
        print(json.dumps(rec, ensure_ascii=False))
