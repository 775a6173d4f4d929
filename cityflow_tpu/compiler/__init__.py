# compiler subpackage: host-side scenario compilation (roadnet/flow JSON ->
# padded device arrays). Import submodules directly, e.g.
#   from cityflow_tpu.compiler.scenario import compile_scenario
