// bondlifetime: average .bnd bond-order frames and report persistent bonds.
//
// Native re-implementation of the reference's only C++ tool
// (ref: util/script/BondLifeTime.cpp:1-120): reads a list of .bnd files,
// counts per-(gid_i,gid_j) bond occupancy across frames, prints unordered
// bonds whose occupancy exceeds a threshold.
//
// Usage: bondlifetime <threshold> file1.bnd [file2.bnd ...]
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <unordered_map>

int main(int argc, char** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s <threshold> <frames.bnd...>\n", argv[0]);
        return 1;
    }
    double thr = atof(argv[1]);
    std::unordered_map<uint64_t, int> counts;
    int nframes = 0;
    char line[1 << 16];
    for (int a = 2; a < argc; ++a) {
        FILE* fh = fopen(argv[a], "r");
        if (!fh) { fprintf(stderr, "cannot open %s\n", argv[a]); return 1; }
        ++nframes;
        while (fgets(line, sizeof line, fh)) {
            char* p = line;
            long gi = strtol(p, &p, 10);
            // skip x y z type
            strtod(p, &p); strtod(p, &p); strtod(p, &p);
            strtol(p, &p, 10);
            long nb = strtol(p, &p, 10);
            for (long k = 0; k < nb; ++k) {
                long gj = strtol(p, &p, 10);
                strtod(p, &p);  // bond order
                uint64_t key = gi < gj
                    ? (uint64_t(gi) << 32) | uint64_t(gj)
                    : (uint64_t(gj) << 32) | uint64_t(gi);
                counts[key] += 1;
            }
        }
        fclose(fh);
    }
    // each bond appears from both endpoints -> 2 counts per frame
    printf("# %d frames, threshold %.3f\n", nframes, thr);
    for (const auto& kv : counts) {
        double occ = kv.second / (2.0 * nframes);
        if (occ >= thr) {
            printf("%12u %12u %8.4f\n", uint32_t(kv.first >> 32),
                   uint32_t(kv.first & 0xffffffffu), occ);
        }
    }
    return 0;
}
