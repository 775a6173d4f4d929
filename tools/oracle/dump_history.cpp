// Validation harness: prints the reference engine's per-road
// Lane::updateHistory aggregates (Road::getAverageDuration /
// historyVehicleNum) each step, so cityflow_tpu's device-side history
// (core/step.py update_history + Engine._road_durations) can be compared
// numerically. `private` is remapped to reach the internals — this TU is
// validation-only and compiles the UNMODIFIED reference sources.
//
// Build (from repo root; mirrors tools/oracle/README.md):
//   g++ -O2 -std=c++11 -DRAPIDJSON_HAS_STDSTRING=1 -Dprivate=public \
//     -I/root/reference/src -Itools/oracle/rapidjson_shim \
//     -I/root/reference/extern/milo tools/oracle/dump_history.cpp \
//     /root/reference/src/engine/engine.cpp ... (same list as dump_golden) \
//     -lpthread -o /tmp/oracle/dump_history
//
// Usage: dump_history <config.json> <steps>
// Output: one JSON line per step:
//   {"t":N,"roads":[[id, historyVehicleNum_sum, avgDuration], ...]}

// pull the whole standard library in first so the access-remap below
// cannot disturb libstdc++ internals (their include guards are already set)
#include <bits/stdc++.h>

#define private public
#define protected public
#include "engine/engine.h"
#undef protected
#undef private

using namespace CityFlow;

int main(int argc, char **argv) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: %s <config.json> <steps>\n", argv[0]);
        return 1;
    }
    Engine engine(argv[1], 1);
    int steps = std::atoi(argv[2]);
    for (int t = 1; t <= steps; ++t) {
        engine.nextStep();
        std::printf("{\"t\":%d,\"roads\":[", t);
        bool first = true;
        for (Road &road : engine.roadnet.getRoads()) {
            int num = 0;
            for (Lane &lane : road.getLanes())
                num += lane.getHistoryVehicleNum();
            double dur = road.getAverageDuration();
            if (!first) std::printf(",");
            first = false;
            std::printf("[\"%s\",%d,%.17g]", road.getId().c_str(), num, dur);
        }
        std::printf("]}\n");
    }
    return 0;
}
