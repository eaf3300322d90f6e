from .batch import load_table, load_testdata, load_trip_csv
from .stream import create_trip_stream

__all__ = ["load_trip_csv", "load_table", "load_testdata", "create_trip_stream"]
