import textwrap

from slowflow_tpu.config import ParameterList


def write_cfg(tmp_path, text):
    p = tmp_path / "test.cfg"
    p.write_text(textwrap.dedent(text))
    return str(p)


def test_basic_parse(tmp_path):
    cfg = write_cfg(tmp_path, """\
    # comment line
    verbose\t0100
    threads\t4
    file\t/data/seq/0%06i.tif\t# path comment
    output\t/out/
    Jets\t225
    start\t10
    scale\t0.25
    slow_flow_S\t3
    """)
    p = ParameterList(cfg)
    assert p.file == "/data/seq/0%06i.tif"
    assert p.output == "/out/"
    assert p.Jets == 225
    assert p.sequence_start == 10
    assert p.parameter("threads", type=int) == 4
    assert p.parameter("scale", type=float) == 0.25
    assert p.parameter("slow_flow_S", type=int) == 3
    assert not p.verbosity(0) and p.verbosity(1)


def test_defaults_and_types(tmp_path):
    p = ParameterList()
    assert p.parameter("missing", "7", int) == 7
    assert p.parameter("missing", "0.5", float) == 0.5
    assert p.parameter("missing", "0", bool) is False
    assert p.parameter("missing", "1", bool) is True
    p.insert("x", "1.5f")  # C-style float suffix must parse like atof
    assert p.parameter("x", type=float) == 1.5


def test_insert_overwrite():
    p = ParameterList()
    p.insert("a", "1")
    p.insert("a", "2", overwrite=False)
    assert p._params["a"] == ["1", "2"]
    p.insert("a", "3", overwrite=True)
    assert p._params["a"] == ["3"]


def test_experiment_grid(tmp_path):
    cfg = write_cfg(tmp_path, """\
    alpha\t(1,2,3)
    beta\t(10,20)
    gamma\t5
    """)
    p = ParameterList(cfg)
    assert p.experiments() == 6
    seen = set()
    while True:
        seen.add((p.parameter("alpha"), p.parameter("beta")))
        if not p.next_exp():
            break
    assert len(seen) == 6


def test_cfg_roundtrip(tmp_path):
    cfg = write_cfg(tmp_path, """\
    file\t/seq/%07i.tif
    output\t/out
    start\t10
    Jets\t4
    scale\t0.25
    jet_fps\t100
    """)
    p = ParameterList(cfg)
    out = tmp_path / "rt.cfg"
    out.write_text(p.cfg_string())
    p2 = ParameterList(str(out))
    assert p2.file == p.file
    assert p2.Jets == p.Jets
    assert p2.sequence_start == p.sequence_start
    assert p2.parameter("scale") == "0.25"
    assert p2.jet_fps == [100]


def test_split_parameter():
    p = ParameterList()
    p.insert("raw_red_loc", "1,0")
    assert p.split_parameter("raw_red_loc") == [1, 0]
    assert p.split_parameter("missing", "2,3") == [2, 3]


def test_clone_independent():
    p = ParameterList()
    p.insert("a", "1")
    q = ParameterList(clone=p)
    q.set_parameter("a", "2")
    assert p.parameter("a") == "1"
    assert q.parameter("a") == "2"
