"""Generate tests/fixtures/hdiff.sdfg — a COSMO-horizontal-diffusion
SDFG in DaCe's serialization layout (VERDICT r2 next #3).

dace cannot be installed in this offline environment (zero egress), so
the fixture is a schema-faithful hand serialization of what the
reference toolchain emits after ``canonicalize_sdfg``: Stencil library
nodes (classpath stencilflow.stencil.stencil.Stencil, the property set
of /root/reference/stencilflow/stencil/stencil.py:11-59) wired through
AccessNodes by MultiConnectorEdges whose connector names do NOT match
the array names, per-state dataflow including a constant scalar
transient written by a Tasklet (remove_scalar_transients input), a
constant stencil (remove_constant_stencils input), an unused transient
sink (remove_unused_sinks input), transient flags on every descriptor,
and a repeated write of the output array across states (SSA versioning,
sdfg_to_stencilflow.py:590-632).

The stencil math is the COSMO hdiff chain the reference's importer was
built for (lap -> flx/fly with predicated limiting -> out), cf.
sdfg_to_stencilflow.py:335-402 (predication) and the paper's hdiff
benchmark.
"""
from __future__ import annotations

import json
import os
import sys

I, J, K = 8, 32, 32
SHAPE = [I, J, K]
FULL = [True, True, True]


def array(name, transient, shape=None, scalar=False):
    if scalar:
        return name, {"type": "Scalar", "attributes": {
            "dtype": "float32", "shape": [1], "transient": transient}}
    return name, {"type": "Array", "attributes": {
        "dtype": "float32", "shape": shape or SHAPE,
        "transient": transient, "storage": "Default"}}


def access(nid, data):
    return {"type": "AccessNode", "label": data, "id": nid,
            "attributes": {"data": data}}


def tasklet(nid, label, code, out_conn):
    return {"type": "Tasklet", "label": label, "id": nid,
            "attributes": {"label": label,
                           "code": {"string_data": code,
                                    "language": "Python"},
                           "in_connectors": {},
                           "out_connectors": {out_conn: None}}}


def stencil(nid, label, accesses, out_conn, bcs, code):
    return {"type": "LibraryNode",
            "classpath": "stencilflow.stencil.stencil.Stencil",
            "label": label, "id": nid,
            "attributes": {
                "label": label,
                "shape": SHAPE,
                "accesses": accesses,
                "output_fields": {out_conn: None},
                "boundary_conditions": bcs,
                "code": {"string_data": code, "language": "Python"},
                "in_connectors": {c: None for c in accesses},
                "out_connectors": {out_conn: None},
            }}


def memlet(src, dst, data, src_conn=None, dst_conn=None):
    return {"type": "MultiConnectorEdge", "src": str(src), "dst": str(dst),
            "src_connector": src_conn, "dst_connector": dst_conn,
            "attributes": {"data": {"type": "Memlet", "attributes": {
                "data": data, "subset": f"0:{I}, 0:{J}, 0:{K}"}}}}


def state(sid, label, nodes, edges):
    return {"type": "SDFGState", "label": label, "id": sid,
            "collapsed": False,
            "attributes": {"nosync": False},
            "nodes": nodes, "edges": edges}


def build():
    cbc = {"btype": "constant", "value": 0.0}

    # state 0: coeff tasklet (scalar transient), constant stencil
    # (4.0 - 0.0 -> lapweight), lap stencil — connectors != data names
    s0 = state(0, "lap_state", [
        access(0, "inp"),
        tasklet(1, "init_coeff", "out = 0.025", "out"),
        access(2, "coeff"),
        stencil(3, "lapweight_node", {}, "w",
                {}, "w = 5.0 - 1.0"),
        access(4, "lapweight"),
        stencil(5, "lap_node",
                {"q": [FULL, [[0, 0, 0], [0, -1, 0], [0, 1, 0],
                              [0, 0, -1], [0, 0, 1]]],
                 "w": [[False, False, False], [[0, 0, 0]]]},
                "lap_out",
                {"q": cbc},
                "lap_out = w * q[0,0,0] - (q[0,-1,0] + q[0,1,0] "
                "+ q[0,0,-1] + q[0,0,1])"),
        access(6, "lap"),
    ], [
        memlet(0, 5, "inp", dst_conn="q"),
        memlet(3, 4, "lapweight", src_conn="w"),
        memlet(4, 5, "lapweight", dst_conn="w"),
        memlet(1, 2, "coeff", src_conn="out"),
        memlet(5, 6, "lap", src_conn="lap_out"),
    ])

    # state 1: flx + fly (parallel, interleaved listing order so the
    # dataflow topological sort is load-bearing) + an unused debug sink
    flx_code = ("flx_out = lap_in[0,1,0] - lap_in[0,0,0]; "
                "flx_out = 0.0 if flx_out * (q[0,1,0] - q[0,0,0]) > 0.0 "
                "else flx_out")
    fly_code = ("fly_out = lap_in[0,0,1] - lap_in[0,0,0]; "
                "fly_out = 0.0 if fly_out * (q[0,0,1] - q[0,0,0]) > 0.0 "
                "else fly_out")
    s1 = state(1, "flux_state", [
        access(0, "lap"),
        access(1, "inp"),
        stencil(2, "dbg_node",
                {"lap_in": [FULL, [[0, 0, 0]]]}, "dbg_out", {},
                "dbg_out = lap_in[0,0,0] * 2.0"),
        stencil(3, "fly_node",
                {"lap_in": [FULL, [[0, 0, 0], [0, 0, 1]]],
                 "q": [FULL, [[0, 0, 0], [0, 0, 1]]]},
                "fly_out", {"lap_in": cbc, "q": cbc}, fly_code),
        access(4, "dbg"),
        stencil(5, "flx_node",
                {"lap_in": [FULL, [[0, 0, 0], [0, 1, 0]]],
                 "q": [FULL, [[0, 0, 0], [0, 1, 0]]]},
                "flx_out", {"lap_in": cbc, "q": cbc}, flx_code),
        access(6, "flx"),
        access(7, "fly"),
    ], [
        memlet(0, 2, "lap", dst_conn="lap_in"),
        memlet(0, 3, "lap", dst_conn="lap_in"),
        memlet(0, 5, "lap", dst_conn="lap_in"),
        memlet(1, 3, "inp", dst_conn="q"),
        memlet(1, 5, "inp", dst_conn="q"),
        memlet(2, 4, "dbg", src_conn="dbg_out"),
        memlet(5, 6, "flx", src_conn="flx_out"),
        memlet(3, 7, "fly", src_conn="fly_out"),
    ])

    # state 2: out = inp - coeff * div(flx, fly); coeff rides a scalar
    # access node into a connector
    s2 = state(2, "out_state", [
        access(0, "inp"),
        access(1, "flx"),
        access(2, "fly"),
        access(3, "coeff"),
        stencil(4, "out_node",
                {"q": [FULL, [[0, 0, 0]]],
                 "fx": [FULL, [[0, 0, 0], [0, -1, 0]]],
                 "fy": [FULL, [[0, 0, 0], [0, 0, -1]]],
                 "c": [[False, False, False], [[0, 0, 0]]]},
                "res",
                {"q": cbc, "fx": cbc, "fy": cbc},
                "res = q[0,0,0] - c * (fx[0,0,0] - fx[0,-1,0] "
                "+ fy[0,0,0] - fy[0,0,-1])"),
        access(5, "out_field"),
    ], [
        memlet(0, 4, "inp", dst_conn="q"),
        memlet(1, 4, "flx", dst_conn="fx"),
        memlet(2, 4, "fly", dst_conn="fy"),
        memlet(3, 4, "coeff", dst_conn="c"),
        memlet(4, 5, "out_field", src_conn="res"),
    ])

    # state 3: repeated write of out_field (SSA versioning: reads its
    # own previous version with offsets)
    s3 = state(3, "smooth_state", [
        access(0, "out_field"),
        stencil(1, "smooth_node",
                {"o": [FULL, [[0, 0, 0], [0, -1, 0], [0, 1, 0]]]},
                "res", {"o": cbc},
                "res = 0.25 * (o[0,-1,0] + o[0,1,0]) + 0.5 * o[0,0,0]"),
        access(2, "out_field"),
    ], [
        memlet(0, 1, "out_field", dst_conn="o"),
        memlet(1, 2, "out_field", src_conn="res"),
    ])

    arrays = dict([
        array("inp", transient=False),
        array("lap", transient=True),
        array("flx", transient=True),
        array("fly", transient=True),
        array("dbg", transient=True),
        array("out_field", transient=False),
        array("coeff", transient=True, scalar=True),
        array("lapweight", transient=True, scalar=True),
    ])

    return {
        "type": "SDFG",
        "dace_version": "0.14.1",
        "attributes": {
            "name": "hdiff",
            "arg_names": ["inp", "out_field"],
            "_arrays": arrays,
            "symbols": {},
        },
        "nodes": [s0, s1, s2, s3],
        "edges": [
            {"type": "Edge", "src": "0", "dst": "1",
             "attributes": {"data": {"type": "InterstateEdge",
                                     "attributes": {}}}},
            {"type": "Edge", "src": "1", "dst": "2",
             "attributes": {"data": {"type": "InterstateEdge",
                                     "attributes": {}}}},
            {"type": "Edge", "src": "2", "dst": "3",
             "attributes": {"data": {"type": "InterstateEdge",
                                     "attributes": {}}}},
        ],
        "sdfg_list_id": 0,
        "start_state": 0,
    }


def main() -> int:
    out = os.path.join(os.path.dirname(__file__), os.pardir, "tests",
                       "fixtures", "hdiff.sdfg")
    out = os.path.normpath(out)
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(build(), f, indent=1)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
