"""Sources: synthetic binlog generation, wire framing, batch readers."""
