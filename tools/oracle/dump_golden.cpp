// Oracle harness: links against the UNMODIFIED reference CityFlow sources
// (mounted read-only at /root/reference) and dumps golden data used to
// validate the TPU-native reimplementation bit-for-bit.
//
// Dumps (to stdout as JSON lines):
//   {"type":"static", ...}   once: lanes, lanelinks, crosses, phases
//   {"type":"step","t":N,...} per step: per-vehicle (id, drivable, dis, speed),
//                             plus lane counts and avg travel time
//
// Usage: dump_golden <configFile> <steps> [--interval k] [--threads n]
#include "engine/engine.h"
#include "roadnet/roadnet.h"
#include "vehicle/vehicle.h"
#include <cstdio>
#include <cstring>
#include <string>
#include <chrono>
#include <vector>

using namespace CityFlow;

static void printEsc(const std::string &s) { fputs(s.c_str(), stdout); }

int main(int argc, char **argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s config steps [--threads n] [--every k] [--static-only]\n", argv[0]); return 1; }
    std::string config = argv[1];
    int steps = atoi(argv[2]);
    int threads = 1, every = 1;
    int fromStep = 0;   // emit step records only for t in (fromStep, steps]
    bool staticOnly = false, aggOnly = false;
    const char *phasesFile = nullptr;
    for (int i = 3; i < argc; i++) {
        if (!strcmp(argv[i], "--threads")) threads = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--every")) every = atoi(argv[++i]);
        else if (!strcmp(argv[i], "--static-only")) staticOnly = true;
        else if (!strcmp(argv[i], "--phases")) phasesFile = argv[++i];
        // per-step cnt+att only (empty vehicles array): the aggregate
        // parity mode (tools/oracle_parity.py --mode aggregate) needs no
        // per-vehicle records, and at 30x30 those dominate the dump cost
        else if (!strcmp(argv[i], "--agg-only")) aggOnly = true;
        // chunking: simulate from 0 but only emit records for steps in
        // (--from, steps]; bounds per-file size for hundreds-of-MB
        // per-vehicle dumps at 30x30 (second arg remains the end step)
        else if (!strcmp(argv[i], "--from")) fromStep = atoi(argv[++i]);
    }

    // RL-phase schedule: text lines "t intersection_id phase"; applied via
    // setTrafficLightPhase before the nextStep that advances to step t+1
    // (the user-controller call order, BASELINE config #2)
    struct PhaseCmd { int t; std::string id; int phase; };
    std::vector<PhaseCmd> phaseCmds;
    if (phasesFile) {
        FILE *pf = fopen(phasesFile, "rb");
        if (!pf) { fprintf(stderr, "cannot open %s\n", phasesFile); return 1; }
        char idbuf[256]; int t, ph;
        while (fscanf(pf, "%d %255s %d", &t, idbuf, &ph) == 3)
            phaseCmds.push_back({t, idbuf, ph});
        fclose(pf);
    }

    Engine eng(config, threads);

    // ---- static dump ----
    printf("{\"type\":\"static\",\"lanes\":[");
    {
        // access roadnet via engine? Engine keeps roadnet private; re-load it.
    }
    RoadNet rn;
    {
        // re-parse config to find roadnet path
        FILE *f = fopen(config.c_str(), "rb");
        std::string buf; char c;
        while ((c = fgetc(f)) != EOF) buf += c;
        fclose(f);
        auto find = [&](const std::string &key) {
            size_t p = buf.find("\"" + key + "\"");
            p = buf.find(':', p); p++;
            while (p < buf.size() && (buf[p] == ' ' || buf[p] == '\t' || buf[p] == '"')) p++;
            size_t e = p;
            while (e < buf.size() && buf[e] != '"' && buf[e] != ',' && buf[e] != '}') e++;
            return buf.substr(p, e - p);
        };
        rn.loadFromJson(find("dir") + find("roadnetFile"));
    }
    bool first = true;
    for (Lane *lane : rn.getLanes()) {
        if (!first) printf(","); first = false;
        printf("{\"id\":\"%s\",\"len\":%.17g,\"maxSpeed\":%.17g,\"points\":[", lane->getId().c_str(), lane->getLength(), lane->getMaxSpeed());
        // points not exposed; use getPointByDistance at 0 and len as probes
        Point p0 = lane->getPointByDistance(0), p1 = lane->getPointByDistance(lane->getLength());
        printf("%.17g,%.17g,%.17g,%.17g]}", p0.x, p0.y, p1.x, p1.y);
    }
    printf("],\"laneLinks\":[");
    first = true;
    for (LaneLink *ll : rn.getLaneLinks()) {
        if (!first) printf(","); first = false;
        printf("{\"id\":\"%s\",\"len\":%.17g,\"type\":%d,\"crosses\":[", ll->getId().c_str(), ll->getLength(), (int)ll->getRoadLinkType());
        bool cf = true;
        for (Cross *cr : ll->getCrosses()) {
            if (!cf) printf(","); cf = false;
            int i = (cr->getLaneLink(0) == ll) ? 0 : 1;
            LaneLink *other = cr->getLaneLink(1 - i);
            printf("{\"other\":\"%s\",\"dist\":%.17g,\"safe\":%.17g,\"ang\":%.17g}",
                   other->getId().c_str(), cr->getDistanceByLane(ll), cr->getSafeDistanceByLane(ll), cr->getAng());
        }
        printf("]}");
    }
    printf("]}\n");
    if (staticOnly) return 0;

    // ---- per-step dump ----
    auto t0 = std::chrono::steady_clock::now();
    size_t cmdIdx = 0;
    for (int t = 0; t < steps; t++) {
        while (cmdIdx < phaseCmds.size() && phaseCmds[cmdIdx].t == t) {
            eng.setTrafficLightPhase(phaseCmds[cmdIdx].id,
                                     phaseCmds[cmdIdx].phase);
            cmdIdx++;
        }
        eng.nextStep();
        if (t + 1 <= fromStep) continue;
        if ((t + 1) % every != 0) continue;
        printf("{\"type\":\"step\",\"t\":%d,\"vehicles\":[", t + 1);
        if (!aggOnly) {
            bool vf = true;
            auto dists = eng.getVehicleDistance();   // full-precision doubles
            auto speeds = eng.getVehicleSpeed();
            for (const auto &vid : eng.getVehicles(false)) {
                auto info = eng.getVehicleInfo(vid);
                if (!vf) printf(","); vf = false;
                printf("{\"id\":\"");
                printEsc(vid);
                printf("\",\"drv\":\"%s\",\"dis\":%.17g,\"speed\":%.17g}",
                       info["drivable"].c_str(), dists[vid], speeds[vid]);
            }
        }
        // cntw = active + waiting-buffer vehicles: distinguishes a
        // late-admission wave (cnt dips, cntw steady) from an early-finish
        // wave (both dip) when diagnosing aggregate drift vs the fast path
        printf("],\"cnt\":%zu,\"cntw\":%zu,\"att\":%.17g}\n", eng.getVehicleCount(),
               eng.getVehicles(true).size(), eng.getAverageTravelTime());
    }
    auto t1 = std::chrono::steady_clock::now();
    fprintf(stderr, "steps=%d wall=%.3fs steps_per_sec=%.1f\n", steps,
            std::chrono::duration<double>(t1 - t0).count(),
            steps / std::chrono::duration<double>(t1 - t0).count());
    return 0;
}
