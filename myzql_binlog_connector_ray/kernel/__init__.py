"""Pure decode/encode kernels (no Ray dependency).

These implement the MySQL binlog wire formats from the public MySQL
documentation, with behavior matching the reference connector
(/root/reference/src/event_parser.zig and friends). Everything here is
a pure function over ``bytes`` — the Ray stages wrap them in
``map_batches`` bodies.
"""
