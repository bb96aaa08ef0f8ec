#!/usr/bin/env python3
"""Real-client certification of graft's hand-rolled Arrow Flight server.

Connects an actual generated pyarrow.flight client (driver-side python,
like check_oracle.py's DuckDB) to a running graft.serving.FlightServe,
walks ListFlights -> GetFlightInfo -> GetSchema -> DoGet, and prints one
JSON line with what the client saw. Exits non-zero on any mismatch
between the transport layers (schema from GetSchema vs the DoGet
stream's schema) or an empty read.

Usage: check_flight.py <port> <path...>   e.g. check_flight.py 50051 events v1
"""
import json
import sys

import pyarrow.flight as fl

port = int(sys.argv[1])
path = sys.argv[2:] or ["events", "v1"]

client = fl.connect(f"grpc+tcp://127.0.0.1:{port}")
flights = list(client.list_flights())
info = client.get_flight_info(fl.FlightDescriptor.for_path(*path))
schema = client.get_schema(fl.FlightDescriptor.for_path(*path)).schema
table = client.do_get(info.endpoints[0].ticket).read_all()

ok = table.num_rows > 0 and table.schema.equals(schema)
out = {
    "metric": "flight_client",
    "flights": len(flights),
    "rows": table.num_rows,
    "cols": table.num_columns,
    "columns": table.schema.names,
    "schema_consistent": table.schema.equals(schema),
    "ok": bool(ok),
}
# a numeric checksum so the caller can hash-compare against the engine side
for name in table.schema.names:
    col = table.column(name)
    try:
        out[f"sum_{name}"] = float(sum(x.as_py() or 0 for x in col))
    except (TypeError, ValueError):
        pass
print(json.dumps(out, sort_keys=True))
sys.exit(0 if ok else 1)
