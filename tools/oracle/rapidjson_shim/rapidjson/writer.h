#ifndef RAPIDJSON_SHIM_WRITER_H
#define RAPIDJSON_SHIM_WRITER_H
#include "document.h"
#include <cstdio>
#include <string>

namespace rapidjson {

template<typename OutputStream>
class Writer {
public:
    explicit Writer(OutputStream &os) : os_(os) {}

    bool Null() { prefix(); put("null"); return true; }
    bool Bool(bool b) { prefix(); put(b ? "true" : "false"); return true; }
    bool Int(int i) { return Int64(i); }
    bool Uint(unsigned u) { return Int64((int64_t)u); }
    bool Int64(int64_t i) {
        prefix();
        char buf[32];
        snprintf(buf, sizeof buf, "%lld", (long long)i);
        put(buf);
        return true;
    }
    bool Uint64(uint64_t u) {
        prefix();
        char buf[32];
        snprintf(buf, sizeof buf, "%llu", (unsigned long long)u);
        put(buf);
        return true;
    }
    bool Double(double d) {
        prefix();
        // %.17g always round-trips; trim to shortest that round-trips
        char buf[40];
        for (int prec = 1; prec <= 17; prec++) {
            snprintf(buf, sizeof buf, "%.*g", prec, d);
            if (strtod(buf, nullptr) == d) break;
        }
        put(buf);
        return true;
    }
    bool String(const char *s, SizeType len, bool) {
        prefix();
        writeString(s, len);
        return true;
    }
    bool Key(const char *s, SizeType len, bool) {
        prefix(true);
        writeString(s, len);
        os_.Put(':');
        return true;
    }
    bool StartObject() { prefix(); os_.Put('{'); stack_.push_back(0); return true; }
    bool EndObject(SizeType = 0) { stack_.pop_back(); os_.Put('}'); markDone(); return true; }
    bool StartArray() { prefix(); os_.Put('['); stack_.push_back(0); return true; }
    bool EndArray(SizeType = 0) { stack_.pop_back(); os_.Put(']'); markDone(); return true; }

private:
    void put(const char *s) { while (*s) os_.Put(*s++); }

    void writeString(const char *s, SizeType len) {
        os_.Put('"');
        for (SizeType i = 0; i < len; i++) {
            char c = s[i];
            switch (c) {
                case '"': put("\\\""); break;
                case '\\': put("\\\\"); break;
                case '\n': put("\\n"); break;
                case '\r': put("\\r"); break;
                case '\t': put("\\t"); break;
                case '\b': put("\\b"); break;
                case '\f': put("\\f"); break;
                default:
                    if ((unsigned char)c < 0x20) {
                        char buf[8];
                        snprintf(buf, sizeof buf, "\\u%04x", c);
                        put(buf);
                    } else os_.Put(c);
            }
        }
        os_.Put('"');
    }

    // comma management: stack_ holds count of items emitted per level;
    // afterKey_ suppresses the comma for the value following a key
    void prefix(bool isKey = false) {
        if (afterKey_) { afterKey_ = false; return; }
        if (!stack_.empty() && stack_.back()++ > 0) os_.Put(',');
        if (isKey) afterKey_ = true;
    }
    void markDone() {}

    OutputStream &os_;
    std::vector<int> stack_;
    bool afterKey_ = false;
};

} // namespace rapidjson
#endif
